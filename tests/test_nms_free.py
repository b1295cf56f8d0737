"""NMS-free decode vs a NumPy oracle of nms_free_coder.py:48-120."""

import numpy as np
import jax.numpy as jnp

from petr_tpu.ops import nms_free_decode
from petr_tpu.ops.boxes import decode_bbox


def test_topk_flat_label_arith():
    rng = np.random.RandomState(0)
    Q, C, K = 40, 10, 15
    logits = rng.randn(Q, C).astype(np.float32) * 3
    codes = rng.randn(Q, 10).astype(np.float32) * 0.5
    out = nms_free_decode(
        jnp.asarray(logits), jnp.asarray(codes), max_num=K, num_classes=C,
        post_center_range=[-61.2, -61.2, -10, 61.2, 61.2, 10],
    )
    scores = 1 / (1 + np.exp(-logits.astype(np.float64))).reshape(-1)
    order = np.argsort(-scores)[:K]
    np.testing.assert_allclose(np.asarray(out["scores"]), scores[order], rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out["labels"]), order % C)
    want_boxes = np.asarray(decode_bbox(jnp.asarray(codes[order // C])))
    np.testing.assert_allclose(np.asarray(out["boxes"]), want_boxes, rtol=1e-4)


def test_post_center_range_mask():
    logits = np.full((5, 2), -10.0, np.float32)
    logits[3, 1] = 5.0
    codes = np.zeros((5, 10), np.float32)
    codes[3, 0] = 100.0  # cx out of range
    out = nms_free_decode(
        jnp.asarray(logits), jnp.asarray(codes), max_num=3, num_classes=2,
        post_center_range=[-61.2, -61.2, -10, 61.2, 61.2, 10],
    )
    assert not bool(out["valid"][0])  # top-1 is the out-of-range box


def test_score_threshold():
    logits = np.zeros((4, 2), np.float32)  # sigmoid = 0.5
    codes = np.zeros((4, 10), np.float32)
    out = nms_free_decode(
        jnp.asarray(logits), jnp.asarray(codes), max_num=4, num_classes=2,
        post_center_range=[-61.2, -61.2, -10, 61.2, 61.2, 10],
        score_threshold=0.6,
    )
    assert not np.asarray(out["valid"]).any()
