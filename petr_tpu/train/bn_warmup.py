"""BN running-stats estimation from forward passes ("precise BN").

Why this exists: every reference recipe trains from an ImageNet-pretrained
backbone whose stored BN running stats match its weights (mmcv
norm_eval=True then freezes them: `petr_vovnet_gridmask_p4_800x320.py:33`,
`vovnetcp.py:406-413`). A FROM-SCRATCH run under the same frozen-BN parity
has identity stats (mean 0, var 1) — i.e. no effective normalization —
which round 4 measured drifting a ~30-conv backbone to 1e15-scale neck
activations: f32 absorbs it, bf16's backward overflows. Estimating the
stats from a few forward passes (each BN normalizes with its CURRENT batch
moments while its input distribution is shaped by the already-normalized
upstream layers) reproduces the "pretrained-stats" regime the reference
recipes actually run in, making the production bf16 dtype trainable from
scratch.

``estimate_bn_stats`` = the classic precise-BN procedure (aggregate exact
moments over N batches, no EMA decay). Re-running it periodically during
training (``--bn-refresh`` in tools/synth_train_eval.py) keeps the frozen
stats tracking the drifting weights without giving up frozen-BN's
per-sample-independent eval and streaming-cache exactness.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp


def _forward_batch_stats(model, params, jb: Dict[str, jax.Array], head_kind: str):
    """One forward in batch-moments mode; returns the "batch_stats" tree."""
    extra = {}
    if head_kind == "depthr":
        extra = dict(
            gt_boxes=jb["gt_boxes"], gt_valid=jb["gt_valid"],
            lidar2img=jb["lidar2img"],
        )
    _, newvars = model.apply(
        {"params": params},
        jb["images"],
        jb["img2lidar"],
        jb["img_hw"],
        timestamp=jb.get("timestamp"),
        mutable=["batch_stats"],
        **extra,
    )
    return newvars.get("batch_stats", {})


def estimate_bn_stats(cfg, params: Any, batches: Iterable[Dict[str, Any]]) -> Any:
    """Estimate BN running stats from forward passes and write them into
    ``params``.

    Moments are combined EXACTLY across the (equal-size) batches:
        mean = avg(mean_i);  var = avg(var_i + mean_i^2) - mean^2
    (the parallel-variance identity), not EMA'd — this is stats
    *estimation*, not norm_eval=False training. Returns ``params``
    unchanged when the model has no batch-mode BN path (e.g. zero batches).
    """
    from petr_tpu.models.detector import PETRDetector

    mcfg = dataclasses.replace(
        cfg.model,
        backbone=dataclasses.replace(cfg.model.backbone, bn_mode="batch"),
    )
    model = PETRDetector(mcfg, deterministic=True)
    head_kind = cfg.model.head.kind

    fwd = jax.jit(
        lambda p, jb: _forward_batch_stats(model, p, jb, head_kind)
    )

    # path-keyed accumulation (robust to dict/FrozenDict pytree types):
    # each BN module emits sibling leaves ...['mean'] / ...['var']
    sum_mean: Dict[str, jax.Array] = {}
    sum_sq: Dict[str, jax.Array] = {}
    n = 0
    for jb in batches:
        flat = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_leaves_with_path(fwd(params, jb))
        }
        if not flat:
            return params
        for ks, v in flat.items():
            if not ks.endswith("['mean']"):
                continue
            parent = ks[: -len("['mean']")]
            sq = flat[parent + "['var']"] + v ** 2
            if parent in sum_mean:
                sum_mean[parent] = sum_mean[parent] + v
                sum_sq[parent] = sum_sq[parent] + sq
            else:
                sum_mean[parent], sum_sq[parent] = v, sq
        n += 1
    if n == 0:
        return params

    flat_out: Dict[str, jax.Array] = {}
    for parent, sm in sum_mean.items():
        mean = sm / n
        var = jnp.maximum(sum_sq[parent] / n - mean ** 2, 0.0)
        flat_out[parent + "['mean']"] = mean
        flat_out[parent + "['var']"] = var

    def upd(path, leaf):
        v = flat_out.get(jax.tree_util.keystr(path))
        return leaf if v is None else v.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(upd, params)
