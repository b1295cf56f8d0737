"""PETR set-prediction loss: per-decoder-layer Hungarian matching + focal/L1.

Behavioral reference: `models/dense_heads/petr_head.py:470-728` +
`core/bbox/assigners/hungarian_assigner_3d.py` (sty61010/PETR):
  * per layer, per sample: cost = FocalLossCost(w=2) + L1 cost (w=0.25) over
    the first 8 normalized code dims; Hungarian assignment; matched queries
    take the GT label/code, the rest are background.
  * focal cls loss normalized by total #positives across the batch
    (optionally pmean-synced across devices); L1 normalized by the
    device-mean #positives (clamped >= 1), weighted by code_weights.
  * all in fp32; gradients do not flow through the matching costs.

TPU-first: GT arrives padded to a static (B, G) with a validity mask; the
matcher runs **on device** (vmapped over layers x batch), so the training
step contains no host sync.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from petr_tpu.ops.boxes import encode_bbox
from petr_tpu.ops.losses import (
    bbox_l1_cost,
    focal_loss_cost,
    sigmoid_focal_loss,
    weighted_l1_loss,
)
from petr_tpu.ops.matcher import lap_solve


def _match_single(
    cls_logits: jax.Array,  # (Q, C)
    codes: jax.Array,  # (Q, 10)
    gt_codes: jax.Array,  # (G, 10)
    gt_labels: jax.Array,  # (G,)
    gt_valid: jax.Array,  # (G,)
    *,
    num_classes: int,
    cls_weight: float,
    bbox_weight: float,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    Q = cls_logits.shape[0]
    cost = focal_loss_cost(cls_logits, gt_labels, weight=cls_weight) + bbox_l1_cost(
        codes[:, :8], gt_codes[:, :8], weight=bbox_weight
    )
    cost = jax.lax.stop_gradient(cost)
    q_of_g = lap_solve(cost.T, gt_valid)  # (G,) distinct queries (valid rows)
    # Invalid (padded) GT rows carry an arbitrary query index — scatter them
    # into a dump slot past Q so they can never clobber a real match.
    q_idx = jnp.where(gt_valid, q_of_g, Q)

    labels_q = jnp.full((Q + 1,), num_classes, jnp.int32)
    labels_q = labels_q.at[q_idx].set(gt_labels.astype(jnp.int32))[:Q]
    targets_q = jnp.zeros((Q + 1, gt_codes.shape[-1]), jnp.float32).at[q_idx].set(
        gt_codes
    )[:Q]
    weights_q = jnp.zeros((Q + 1,), jnp.float32).at[q_idx].set(1.0)[:Q]
    return labels_q, targets_q, weights_q, gt_valid.sum().astype(jnp.float32)


def petr_set_loss(
    outputs: Dict[str, jax.Array],
    gt_boxes: jax.Array,  # (B, G, 9) raw gravity-center boxes (padded)
    gt_labels: jax.Array,  # (B, G) int
    gt_valid: jax.Array,  # (B, G) bool
    *,
    num_classes: int = 10,
    cls_weight: float = 2.0,
    bbox_weight: float = 0.25,
    code_weights: Sequence[float] = (1.0,) * 8 + (0.2, 0.2),
    sync_cls_avg_factor: bool = False,
    axis_name: str | None = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total loss + per-layer breakdown. Call inside jit/pjit."""
    all_cls = outputs["cls_logits"].astype(jnp.float32)  # (L, B, Q, C)
    all_codes = outputs["bbox_codes"].astype(jnp.float32)  # (L, B, Q, 10)
    L, B, Q, _ = all_cls.shape
    code_w = jnp.asarray(code_weights, jnp.float32)

    gt_codes = encode_bbox(gt_boxes.astype(jnp.float32))  # (B, G, 10)
    # padded rows -> finite zeros so cost/target math stays clean
    gt_codes = jnp.where(gt_valid[..., None], jnp.nan_to_num(gt_codes), 0.0)

    match = jax.vmap(
        jax.vmap(
            lambda cl, co, gc, gl, gv: _match_single(
                cl, co, gc, gl, gv,
                num_classes=num_classes,
                cls_weight=cls_weight,
                bbox_weight=bbox_weight,
            ),
            in_axes=(0, 0, 0, 0, 0),
        ),
        in_axes=(0, 0, None, None, None),
    )
    labels, targets, weights, num_pos = match(
        all_cls, all_codes, gt_codes, gt_labels, gt_valid
    )  # (L,B,Q), (L,B,Q,10), (L,B,Q), (L,B)

    losses: Dict[str, jax.Array] = {}
    total = 0.0
    for lvl in range(L):
        n_pos = num_pos[lvl].sum()
        if sync_cls_avg_factor:
            # one global normalizer (the reference's reduce_mean'd variant)
            cls_avg = jnp.maximum(n_pos, 1.0)
            loss_cls = (
                sigmoid_focal_loss(
                    all_cls[lvl].reshape(B * Q, -1),
                    labels[lvl].reshape(B * Q),
                    num_classes=num_classes,
                    avg_factor=cls_avg,
                )
                * cls_weight
            )
        else:
            # reference default: each DDP rank (1 sample/GPU) normalizes by
            # its OWN positive count before gradient averaging — reproduce as
            # a per-sample normalized mean so the global-batch formulation
            # matches the 8-GPU recipe exactly
            per_sample = jax.vmap(
                lambda cl, lb, np_: sigmoid_focal_loss(
                    cl, lb, num_classes=num_classes, avg_factor=jnp.maximum(np_, 1.0)
                )
            )(all_cls[lvl], labels[lvl], num_pos[lvl])
            loss_cls = per_sample.mean() * cls_weight

        n_pos_mean = n_pos
        if axis_name is not None:
            n_pos_mean = jax.lax.pmean(n_pos_mean, axis_name)
        n_pos_mean = jnp.maximum(n_pos_mean, 1.0)

        tgt = targets[lvl]
        finite = jnp.isfinite(tgt).all(-1)
        w = weights[lvl] * finite.astype(jnp.float32)
        loss_bbox = (
            weighted_l1_loss(
                all_codes[lvl],
                jnp.nan_to_num(tgt),
                w[..., None] * code_w,
                avg_factor=n_pos_mean,
            )
            * bbox_weight
        )

        loss_cls = jnp.nan_to_num(loss_cls)
        loss_bbox = jnp.nan_to_num(loss_bbox)
        prefix = "" if lvl == L - 1 else f"d{lvl}."
        losses[f"{prefix}loss_cls"] = loss_cls
        losses[f"{prefix}loss_bbox"] = loss_bbox
        total = total + loss_cls + loss_bbox

    losses["num_pos"] = num_pos[-1].sum()
    return total, losses
