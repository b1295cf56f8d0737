"""Checkpoint save/restore (orbax), with keep-last-k rotation.

Reference semantics: mmcv CheckpointHook interval=1, max_keep_ckpts=3
(`petrv2_vovnet_gridmask_p4_800x320.py:263`), `load_from` partial init for
pretrained backbones, `resume_from` full state resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ckpt_dir(base: str, step: int) -> str:
    return os.path.join(base, f"step_{step:08d}")


def save_checkpoint(
    base: str, step: int, state: Any, max_keep: int = 3, meta: Optional[dict] = None
) -> str:
    """Save state; ``meta`` (config json, class names, version — the
    reference embeds the same, `tools/train.py:233-243`) is written alongside
    as meta.json.

    Multi-host: call from EVERY process — orbax coordinates the commit across
    the distributed runtime (a rank-0-only call deadlocks on its barrier).
    The primary process alone writes meta.json and rotates old checkpoints.
    """
    import json

    import orbax.checkpoint as ocp

    is_primary = jax.process_index() == 0
    os.makedirs(base, exist_ok=True)
    path = _ckpt_dir(base, step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(path),
            {"params": state.params, "opt_state": state.opt_state, "step": state.step},
            force=True,
        )
    if meta is not None and is_primary:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
    if is_primary:
        # rotate
        kept = sorted(d for d in os.listdir(base) if d.startswith("step_"))
        for d in kept[:-max_keep]:
            import shutil

            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    return path


def latest_checkpoint(base: str) -> Optional[str]:
    if not os.path.isdir(base):
        return None
    kept = sorted(d for d in os.listdir(base) if d.startswith("step_"))
    return os.path.join(base, kept[-1]) if kept else None


def restore_checkpoint(path: str, state: Any) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        target = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        restored = ckptr.restore(os.path.abspath(path), target)
    return state.replace(
        params=restored["params"], opt_state=restored["opt_state"], step=restored["step"]
    )


def load_params(path: str, params_like: Any) -> Any:
    """Restore only params (load_from-style partial init).

    Restores without a template (orbax rejects item trees whose opt_state
    slot is None), then maps onto ``params_like`` to validate structure.
    """
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path))
    return jax.tree.map(lambda _, s: np.asarray(s), params_like, restored["params"])
