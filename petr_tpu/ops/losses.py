"""Detection losses and matching costs, pure JAX (XLA fuses these fine).

Behavioral references (sty61010/PETR):
  - sigmoid focal loss: mmdet `FocalLoss(use_sigmoid=True, gamma=2, alpha=.25)`
    invoked at `petr_head.py:623`.
  - L1 loss with per-element weights: mmdet `L1Loss` at `petr_head.py:638`.
  - FocalLossCost / BBox3DL1Cost: `hungarian_assigner_3d.py:117-123`,
    `match_costs/match_cost.py:6-27`.

All computed in fp32 (the reference wraps losses in force_fp32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    weights: jax.Array | None = None,
    *,
    num_classes: int,
    gamma: float = 2.0,
    alpha: float = 0.25,
    avg_factor: jax.Array | float = 1.0,
) -> jax.Array:
    """Sigmoid focal loss, summed and normalized by ``avg_factor``.

    Args:
        logits: (..., num_classes) raw scores.
        labels: (...,) int class ids; ``num_classes`` means background
            (all-zero one-hot target).
        weights: optional (...,) per-sample weight.
    """
    logits = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    # one_hot with depth=num_classes maps label==num_classes to all zeros.
    t = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    pt = (1.0 - p) * t + p * (1.0 - t)
    focal_weight = (alpha * t + (1.0 - alpha) * (1.0 - t)) * jnp.power(pt, gamma)
    bce = -(t * jax.nn.log_sigmoid(logits) + (1.0 - t) * jax.nn.log_sigmoid(-logits))
    loss = bce * focal_weight
    if weights is not None:
        loss = loss * weights[..., None].astype(jnp.float32)
    return loss.sum() / avg_factor


def weighted_l1_loss(
    pred: jax.Array,
    target: jax.Array,
    weights: jax.Array,
    *,
    avg_factor: jax.Array | float = 1.0,
) -> jax.Array:
    """Element-wise-weighted L1, summed / avg_factor."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return (diff * weights.astype(jnp.float32)).sum() / avg_factor


def focal_loss_cost(
    logits: jax.Array,
    gt_labels: jax.Array,
    *,
    weight: float = 2.0,
    gamma: float = 2.0,
    alpha: float = 0.25,
    eps: float = 1e-12,
) -> jax.Array:
    """mmdet FocalLossCost: cost[q, g] for matching.

    Args:
        logits: (Q, C); gt_labels: (G,).
    Returns:
        (Q, G) cost.
    """
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    neg_cost = -jnp.log(1.0 - p + eps) * (1.0 - alpha) * jnp.power(p, gamma)
    pos_cost = -jnp.log(p + eps) * alpha * jnp.power(1.0 - p, gamma)
    cls_cost = pos_cost - neg_cost  # (Q, C)
    return cls_cost[:, gt_labels] * weight


def bbox_l1_cost(
    bbox_pred: jax.Array, gt_codes: jax.Array, *, weight: float = 0.25
) -> jax.Array:
    """L1 cdist between predicted codes and normalized GT codes.

    The reference matches over the first 8 dims only
    (`hungarian_assigner_3d.py:122`); slice before calling.
    """
    diff = jnp.abs(bbox_pred[:, None, :].astype(jnp.float32) - gt_codes[None, :, :].astype(jnp.float32))
    return diff.sum(-1) * weight
