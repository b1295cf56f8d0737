"""Full set-loss pipeline vs an independent NumPy+scipy oracle.

Reproduces the reference's exact single-GPU loss semantics
(`models/dense_heads/petr_head.py:578-644` + `core/bbox/assigners/
hungarian_assigner_3d.py:96-143` + mmdet FocalLoss/L1Loss formulas) from
scratch — scipy Hungarian on the nan-clamped focal+L1 cost, background=
num_classes one-hot-to-zeros focal with cls_avg_factor=num_pos, isfinite
filter on normalized targets, code_weights, avg_factor=max(num_pos,1) — and
requires `petr_set_loss` to match per layer. B=1 so the reference per-rank
normalization and our per-sample-normalized mean coincide exactly.
"""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from petr_tpu.train.losses import petr_set_loss


def np_normalize_bbox(boxes):
    """Reference `core/bbox/util.py:38-61`: interleaved 10-dim codec."""
    cx, cy, cz, w, l, h, rot, vx, vy = [boxes[..., i] for i in range(9)]
    with np.errstate(divide="ignore"):
        return np.stack(
            [cx, cy, np.log(w), np.log(l), cz, np.log(h),
             np.sin(rot), np.cos(rot), vx, vy], axis=-1,
        )


def np_focal_cost(logits, gt_labels, weight=2.0, alpha=0.25, gamma=2.0, eps=1e-12):
    p = 1.0 / (1.0 + np.exp(-logits))
    neg = -np.log(1.0 - p + eps) * (1.0 - alpha) * p ** gamma
    pos = -np.log(p + eps) * alpha * (1.0 - p) ** gamma
    return (pos - neg)[:, gt_labels] * weight


def np_focal_loss(logits, labels, num_classes, avg_factor, alpha=0.25, gamma=2.0):
    t = np.eye(num_classes + 1, dtype=np.float64)[labels][:, :num_classes]
    p = 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))
    pt = (1.0 - p) * t + p * (1.0 - t)
    fw = (alpha * t + (1.0 - alpha) * (1.0 - t)) * pt ** gamma
    bce = -(t * np.log(p) + (1.0 - t) * np.log(1.0 - p))
    return (bce * fw).sum() / avg_factor


def oracle_layer_loss(logits, codes, gt_boxes, gt_labels, *, num_classes=10,
                      cls_weight=2.0, bbox_weight=0.25,
                      code_weights=(1.0,) * 8 + (0.2, 0.2)):
    """Reference loss_single for ONE sample (num_imgs=1)."""
    Q = logits.shape[0]
    G = gt_boxes.shape[0]
    labels = np.full((Q,), num_classes, np.int64)
    bbox_targets = np.zeros((Q, 9), np.float64)
    bbox_weights = np.zeros((Q, 10), np.float64)
    num_pos = 0
    if G > 0:
        gt_norm = np_normalize_bbox(gt_boxes)
        cost = np_focal_cost(logits, gt_labels, weight=cls_weight)
        cost = cost + np.abs(codes[:, None, :8] - gt_norm[None, :, :8]).sum(-1) * bbox_weight
        cost = np.nan_to_num(cost, nan=100.0, posinf=100.0, neginf=-100.0)
        rows, cols = linear_sum_assignment(cost)
        labels[rows] = gt_labels[cols]
        bbox_targets[rows] = gt_boxes[cols]
        bbox_weights[rows] = 1.0
        num_pos = len(rows)

    cls_avg = max(num_pos * 1.0, 1.0)
    loss_cls = np_focal_loss(logits, labels, num_classes, cls_avg) * cls_weight

    npos = max(float(num_pos), 1.0)
    norm_targets = np_normalize_bbox(bbox_targets)
    isnotnan = np.isfinite(norm_targets).all(-1)
    w = bbox_weights * np.asarray(code_weights)
    diff = np.abs(codes.astype(np.float64) - norm_targets)[isnotnan] * w[isnotnan]
    loss_bbox = diff.sum() / npos * bbox_weight
    return loss_cls, loss_bbox, num_pos


def test_set_loss_matches_numpy_scipy_oracle():
    rng = np.random.RandomState(0)
    L, B, Q, G, ncls = 3, 1, 40, 7, 10
    logits = rng.randn(L, B, Q, ncls).astype(np.float32) * 2
    codes = rng.randn(L, B, Q, 10).astype(np.float32)
    gt_boxes = np.concatenate(
        [rng.uniform(-30, 30, (B, G, 2)), rng.uniform(-3, 1, (B, G, 1)),
         rng.uniform(1, 4, (B, G, 3)), rng.uniform(-np.pi, np.pi, (B, G, 1)),
         rng.uniform(-2, 2, (B, G, 2))], -1,
    ).astype(np.float32)
    gt_labels = rng.randint(0, ncls, (B, G)).astype(np.int32)
    gt_valid = np.zeros((B, G), bool)
    gt_valid[:, :5] = True

    total, losses = petr_set_loss(
        {"cls_logits": jnp.asarray(logits), "bbox_codes": jnp.asarray(codes)},
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid),
        num_classes=ncls,
    )

    exp_total = 0.0
    for lvl in range(L):
        ec, eb, npos = oracle_layer_loss(
            logits[lvl, 0].astype(np.float64), codes[lvl, 0].astype(np.float64),
            gt_boxes[0, :5].astype(np.float64), gt_labels[0, :5],
            num_classes=ncls,
        )
        prefix = "" if lvl == L - 1 else f"d{lvl}."
        np.testing.assert_allclose(float(losses[f"{prefix}loss_cls"]), ec, rtol=2e-5)
        np.testing.assert_allclose(float(losses[f"{prefix}loss_bbox"]), eb, rtol=2e-5)
        exp_total += ec + eb
    assert npos == 5
    np.testing.assert_allclose(float(total), exp_total, rtol=2e-5)


def test_set_loss_zero_gt_matches_oracle():
    rng = np.random.RandomState(1)
    L, B, Q, G, ncls = 2, 1, 16, 4, 10
    logits = rng.randn(L, B, Q, ncls).astype(np.float32)
    codes = rng.randn(L, B, Q, 10).astype(np.float32)
    gt_boxes = np.abs(rng.randn(B, G, 9)).astype(np.float32) + 0.5
    gt_labels = rng.randint(0, ncls, (B, G)).astype(np.int32)
    gt_valid = np.zeros((B, G), bool)  # no valid GT

    total, losses = petr_set_loss(
        {"cls_logits": jnp.asarray(logits), "bbox_codes": jnp.asarray(codes)},
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid),
        num_classes=ncls,
    )
    for lvl in range(L):
        ec, eb, _ = oracle_layer_loss(
            logits[lvl, 0].astype(np.float64), codes[lvl, 0].astype(np.float64),
            np.zeros((0, 9)), np.zeros((0,), np.int64), num_classes=ncls,
        )
        prefix = "" if lvl == L - 1 else f"d{lvl}."
        np.testing.assert_allclose(float(losses[f"{prefix}loss_cls"]), ec, rtol=2e-5)
        np.testing.assert_allclose(float(losses[f"{prefix}loss_bbox"]), eb, atol=1e-7)
