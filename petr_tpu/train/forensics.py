"""Divergence forensics: snapshot + replay machinery for NaN hunts.

The reference stack has nothing like this (SURVEY.md §5: no sanitizers, no
failure diagnosis); mmcv users bisect NaNs by hand. Here a training driver
keeps a rolling host snapshot of the last healthy optimizer state, saves it
when the in-step nonfinite-gradient watch trips (train_step metrics
``grad_nonfinite``/``grad_norm``), and `tools/nan_replay.py` replays from
the snapshot with a per-step watch to catch the exact step, then dissects
it: per-subtree gradient nonfinite counts and a `capture_intermediates`
forward that names the first module emitting a nonfinite activation.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_snapshot(out_dir: str, host_state: Any, step: int, cfg: Any,
                  loader_args: Optional[Dict] = None) -> str:
    """Pickle the last-healthy (params, opt_state, step) + config.

    ``host_state``: a device_get of the TrainState (tx closures are NOT
    saved — the replay rebuilds the optimizer from ``cfg``).
    """
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"healthy_step_{step:08d}.pkl")
    with open(path, "wb") as f:
        pickle.dump(
            {
                "params": jax.device_get(host_state.params),
                "opt_state": jax.device_get(host_state.opt_state),
                "step": int(step),
                "cfg": cfg,
                "loader_args": loader_args or {},
            },
            f,
        )
    return path


def load_snapshot(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def nonfinite_by_subtree(tree: Any) -> Dict[str, int]:
    """{top-level key: count of nonfinite scalars} for a param/grad tree."""
    out = {}
    for k, sub in tree.items():
        n = int(sum(int((~np.isfinite(np.asarray(v))).sum())
                    for v in jax.tree.leaves(sub)))
        if n:
            out[k] = n
    return out


def first_nonfinite_intermediates(model, variables, *args, **kwargs):
    """Return module paths whose outputs contain nonfinite values.

    The nonfinite counts are reduced ON DEVICE inside one jit (a
    capture_intermediates tree is GBs of activations — device_get'ing it
    over a slow link would take minutes; the counts are scalars)."""
    import jax.numpy as jnp

    def f(variables, *args):
        _, mods = model.apply(
            variables, *args, capture_intermediates=True, **kwargs
        )

        def count(a):
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
                return ((~jnp.isfinite(a)).sum().astype(jnp.int32),
                        jnp.int32(a.size))
            return (jnp.int32(0), jnp.int32(0))

        return jax.tree.map(count, mods.get("intermediates", {}))

    counts = jax.device_get(jax.jit(f)(variables, *args))
    flat = jax.tree_util.tree_flatten_with_path(counts)[0]
    # tree_map turned each module output into a (count, size) tuple, so the
    # flat leaves come in path-sharing pairs ending [0] / [1]
    bad = []
    it = iter(flat)
    for (p1, n), (_p2, size) in zip(it, it):
        if int(n):
            bad.append((jax.tree_util.keystr(p1), int(n), int(size)))
    return None, bad
