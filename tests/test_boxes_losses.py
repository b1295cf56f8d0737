"""Box codec + loss/cost functions vs oracles (incl. torch-free mmdet math)."""

import numpy as np
import jax
import jax.numpy as jnp

from petr_tpu.ops import (
    encode_bbox,
    decode_bbox,
    gravity_center_boxes,
    bottom_center_boxes,
    sigmoid_focal_loss,
    weighted_l1_loss,
    focal_loss_cost,
    bbox_l1_cost,
)


def rand_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    cx = rng.uniform(-50, 50, (n, 1))
    cy = rng.uniform(-50, 50, (n, 1))
    cz = rng.uniform(-4, 2, (n, 1))
    wlh = rng.uniform(0.5, 8, (n, 3))
    yaw = rng.uniform(-np.pi, np.pi, (n, 1))
    v = rng.uniform(-5, 5, (n, 2))
    return np.concatenate([cx, cy, cz, wlh, yaw, v], -1).astype(np.float32)


def test_encode_layout_interleaved():
    b = rand_boxes(4)
    code = np.asarray(encode_bbox(jnp.asarray(b)))
    assert code.shape == (4, 10)
    np.testing.assert_allclose(code[:, 0], b[:, 0], rtol=1e-6)  # cx
    np.testing.assert_allclose(code[:, 2], np.log(b[:, 3]), rtol=1e-4)  # log w
    np.testing.assert_allclose(code[:, 4], b[:, 2], rtol=1e-6)  # cz at idx 4!
    np.testing.assert_allclose(code[:, 6], np.sin(b[:, 6]), atol=1e-6)
    np.testing.assert_allclose(code[:, 9], b[:, 8], rtol=1e-6)  # vy


def test_encode_decode_involution():
    b = rand_boxes(16, seed=3)
    rec = np.asarray(decode_bbox(encode_bbox(jnp.asarray(b))))
    # yaw comes back wrapped to (-pi, pi]; inputs already are
    np.testing.assert_allclose(rec, b, rtol=1e-4, atol=1e-4)


def test_encode_decode_7dim():
    b = rand_boxes(5)[:, :7]
    code = encode_bbox(jnp.asarray(b))
    assert code.shape == (5, 8)
    rec = np.asarray(decode_bbox(code))
    np.testing.assert_allclose(rec, b, atol=1e-4)


def test_points_img2cam_roundtrip_and_oracle():
    from petr_tpu.ops import points_img2cam

    rng = np.random.RandomState(0)
    K3 = np.array([[400.0, 0, 320.0], [0, 410.0, 180.0], [0, 0, 1.0]], np.float32)
    # project known camera points, then unproject (u, v, d) back
    pts_cam = np.concatenate(
        [rng.uniform(-10, 10, (32, 2)), rng.uniform(2, 50, (32, 1))], -1
    ).astype(np.float32)
    uvw = pts_cam @ K3.T
    uvd = np.concatenate([uvw[:, :2] / uvw[:, 2:3], pts_cam[:, 2:3]], -1)
    for K in (K3, np.concatenate([K3, np.zeros((3, 1), np.float32)], 1),
              np.block([[K3, np.zeros((3, 1))], [np.zeros((1, 3)), np.ones((1, 1))]]).astype(np.float32)):
        got = np.asarray(points_img2cam(jnp.asarray(uvd), jnp.asarray(K)))
        np.testing.assert_allclose(got, pts_cam, rtol=1e-4, atol=1e-3)


def test_gravity_bottom_center_roundtrip():
    b = rand_boxes(8, seed=1)
    g = gravity_center_boxes(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(g)[:, 2], b[:, 2] + b[:, 5] / 2, rtol=1e-6)
    back = np.asarray(bottom_center_boxes(g))
    np.testing.assert_allclose(back, b, atol=1e-5)


def np_sigmoid_focal(logits, labels, num_classes, gamma=2.0, alpha=0.25):
    p = 1 / (1 + np.exp(-logits))
    t = np.eye(num_classes + 1)[labels][:, :num_classes]
    pt = (1 - p) * t + p * (1 - t)
    fw = (alpha * t + (1 - alpha) * (1 - t)) * pt**gamma
    bce = -(t * np.log(p + 1e-30) + (1 - t) * np.log(1 - p + 1e-30))
    return (bce * fw).sum()


def test_sigmoid_focal_loss_matches_oracle():
    rng = np.random.RandomState(0)
    logits = rng.randn(20, 10).astype(np.float32) * 2
    labels = rng.randint(0, 11, 20)  # 10 = background
    got = float(
        sigmoid_focal_loss(
            jnp.asarray(logits), jnp.asarray(labels), num_classes=10, avg_factor=7.0
        )
    )
    want = np_sigmoid_focal(logits.astype(np.float64), labels, 10) / 7.0
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_weighted_l1():
    rng = np.random.RandomState(0)
    p, t, w = rng.randn(6, 10), rng.randn(6, 10), rng.rand(6, 10)
    got = float(
        weighted_l1_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w), avg_factor=3.0)
    )
    np.testing.assert_allclose(got, (np.abs(p - t) * w).sum() / 3.0, rtol=1e-4)


def test_focal_cost_oracle():
    rng = np.random.RandomState(0)
    logits = rng.randn(7, 10).astype(np.float32)
    labels = rng.randint(0, 10, 4)
    got = np.asarray(focal_loss_cost(jnp.asarray(logits), jnp.asarray(labels)))
    p = 1 / (1 + np.exp(-logits.astype(np.float64)))
    neg = -np.log(1 - p + 1e-12) * 0.75 * p**2
    pos = -np.log(p + 1e-12) * 0.25 * (1 - p) ** 2
    want = (pos - neg)[:, labels] * 2.0
    assert got.shape == (7, 4)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_bbox_l1_cost_is_cdist():
    rng = np.random.RandomState(0)
    a, b = rng.randn(5, 8).astype(np.float32), rng.randn(3, 8).astype(np.float32)
    got = np.asarray(bbox_l1_cost(jnp.asarray(a), jnp.asarray(b), weight=0.25))
    want = np.abs(a[:, None] - b[None]).sum(-1) * 0.25
    np.testing.assert_allclose(got, want, rtol=1e-5)
