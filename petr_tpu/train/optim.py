"""Optimizer + LR schedule matching the reference recipe.

Reference (`projects/configs/petr/petr_vovnet_gridmask_p4_800x320.py:241-260`):
AdamW lr 2e-4 (backbone x0.1), weight decay 0.01, grad-clip global-norm 35,
cosine annealing to 1e-3 of peak with 500-iter linear warmup (ratio 1/3),
24 epochs. FP16 loss scaling is replaced by bf16 compute (no scaling needed
on TPU); frozen-BN statistics are masked out of the update.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from petr_tpu.configs.config import OptimConfig


def make_lr_schedule(cfg: OptimConfig, total_steps: int) -> Callable[[jax.Array], jax.Array]:
    """mmcv-style CosineAnnealing with linear warmup.

    warmup (iter < warmup_iters): lr * (1 - (1 - t/T_w) * (1 - ratio))
    after: cosine from lr to lr*min_lr_ratio over total_steps (progress
    measured from step 0, as mmcv does).
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        t = jnp.minimum(step / max(cfg.warmup_iters, 1), 1.0)
        warm = cfg.lr * (1.0 - (1.0 - t) * (1.0 - cfg.warmup_ratio))
        progress = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        target = cfg.lr * cfg.min_lr_ratio
        cos = target + 0.5 * (cfg.lr - target) * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < cfg.warmup_iters, jnp.minimum(warm, cos), cos)

    return schedule


def _key(entry) -> str:
    return entry.key if hasattr(entry, "key") else str(entry)


def _is_frozen_stat(path) -> bool:
    return _key(path[-1]) in ("mean", "var")


def _is_backbone(path) -> bool:
    return _key(path[0]) == "backbone"


def _is_bn_affine(path) -> bool:
    """scale/bias of a FrozenBatchNorm (module name contains 'bn')."""
    return _key(path[-1]) in ("scale", "bias") and any(
        "bn" in _key(p) for p in path[:-1]
    )


def param_labels(params, freeze_backbone_bn_affine: bool = False) -> Any:
    """Label tree: 'frozen' (BN stats; + backbone BN affine for the r50
    configs, reference norm_cfg requires_grad=False), 'backbone', or 'main'."""

    def label(path, _):
        if _is_frozen_stat(path):
            return "frozen"
        if freeze_backbone_bn_affine and _is_backbone(path) and _is_bn_affine(path):
            return "frozen"
        if _is_backbone(path):
            return "backbone"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    cfg: OptimConfig,
    total_steps: int,
    params,
    freeze_backbone_bn_affine: bool = False,
) -> optax.GradientTransformation:
    sched = make_lr_schedule(cfg, total_steps)

    def adamw(lr_mult: float):
        return optax.adamw(
            learning_rate=lambda s: sched(s) * lr_mult,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=cfg.weight_decay,
        )

    labels = param_labels(params, freeze_backbone_bn_affine)
    tx = optax.multi_transform(
        {
            "main": adamw(1.0),
            "backbone": adamw(cfg.backbone_lr_mult),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    # Zero frozen-param grads BEFORE the global-norm clip: in the reference
    # those params have requires_grad=False, so torch's clip_grad_norm_ never
    # sees them — including them here would inflate the norm and change the
    # clip factor whenever clipping engages.
    frozen_mask = jax.tree.map(lambda l: l == "frozen", labels)
    zero_frozen = optax.masked(optax.set_to_zero(), frozen_mask)
    return optax.chain(zero_frozen, optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
