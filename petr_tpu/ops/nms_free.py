"""NMS-free top-k box decoding, static-shaped.

Behavioral reference: `core/bbox/coders/nms_free_coder.py:48-120`
(sty61010/PETR). The reference filters boxes outside ``post_center_range`` by
boolean indexing (dynamic shape); here the output stays a fixed ``max_num``
with a validity mask — callers drop invalid rows on the host.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from petr_tpu.ops.boxes import decode_bbox


def nms_free_decode(
    cls_logits: jax.Array,
    bbox_codes: jax.Array,
    *,
    max_num: int = 300,
    num_classes: int = 10,
    post_center_range: Sequence[float] | None = None,
    score_threshold: float | None = None,
) -> Dict[str, jax.Array]:
    """Decode one sample's final-layer head outputs.

    Args:
        cls_logits: (Q, num_classes).
        bbox_codes: (Q, 10) normalized codes (centers already denormalized
            into metric pc_range by the head).
    Returns:
        dict with boxes (max_num, 9) raw gravity-center boxes, scores
        (max_num,), labels (max_num,) int32, valid (max_num,) bool.
    """
    scores_all = jax.nn.sigmoid(cls_logits.astype(jnp.float32)).reshape(-1)
    max_num = min(max_num, scores_all.shape[0])
    scores, idx = jax.lax.top_k(scores_all, max_num)
    labels = (idx % num_classes).astype(jnp.int32)
    box_idx = idx // num_classes
    codes = bbox_codes[box_idx]
    boxes = decode_bbox(codes)

    valid = jnp.ones((max_num,), jnp.bool_)
    if score_threshold is not None:
        valid &= scores > score_threshold
    if post_center_range is not None:
        pcr = jnp.asarray(post_center_range, jnp.float32)
        centers = boxes[..., :3]
        valid &= (centers >= pcr[:3]).all(-1) & (centers <= pcr[3:]).all(-1)
    return {"boxes": boxes, "scores": scores, "labels": labels, "valid": valid}


def nms_free_decode_softmax(
    cls_logits: jax.Array,
    bbox_codes: jax.Array,
    *,
    max_num: int = 300,
    num_classes: int = 10,
    post_center_range: Sequence[float] | None = None,
    score_threshold: float | None = None,
) -> Dict[str, jax.Array]:
    """Softmax-classification variant (NMSFreeClsCoder, nms_free_coder.py:125):
    per-query softmax over (num_classes + 1) logits with a background class;
    top-k over the foreground max per query."""
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)[..., :num_classes]
    scores_q = probs.max(-1)
    labels_q = probs.argmax(-1).astype(jnp.int32)
    k = min(max_num, scores_q.shape[0])
    scores, idx = jax.lax.top_k(scores_q, k)
    labels = labels_q[idx]
    boxes = decode_bbox(bbox_codes[idx])
    valid = jnp.ones((k,), jnp.bool_)
    if score_threshold is not None:
        valid &= scores > score_threshold
    if post_center_range is not None:
        pcr = jnp.asarray(post_center_range, jnp.float32)
        centers = boxes[..., :3]
        valid &= (centers >= pcr[:3]).all(-1) & (centers <= pcr[3:]).all(-1)
    return {"boxes": boxes, "scores": scores, "labels": labels, "valid": valid}
