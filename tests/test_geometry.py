"""Geometry ops vs independent NumPy oracles (reference-semantics checks)."""

import numpy as np
import jax.numpy as jnp
import pytest

from petr_tpu.ops import (
    inverse_sigmoid,
    pos2posemb3d,
    depth_bins,
    frustum_coords,
    position_coords_3d,
    sine_posemb_2d_multiview,
)


def np_pos2posemb3d(pos, num_pos_feats=128, temperature=10000.0):
    """Oracle transcribing petr_head.py:31-43 semantics in NumPy."""
    scale = 2 * np.pi
    pos = pos * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    out = []
    for order_idx in (1, 0, 2):  # output order y, x, z
        p = pos[..., order_idx, None] / dim_t
        emb = np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])], axis=-1)
        out.append(emb.reshape(*p.shape[:-1], num_pos_feats))
    return np.concatenate(out, axis=-1)


def test_inverse_sigmoid_roundtrip():
    x = np.linspace(0.01, 0.99, 64).astype(np.float32)
    y = np.asarray(inverse_sigmoid(jnp.asarray(x)))
    np.testing.assert_allclose(1 / (1 + np.exp(-y)), x, atol=1e-5)


def test_inverse_sigmoid_clamps():
    y = np.asarray(inverse_sigmoid(jnp.asarray([0.0, 1.0], dtype=jnp.float32)))
    expected = np.log(np.array([1e-5, 1.0]) / np.array([1.0, 1e-5]))
    np.testing.assert_allclose(y, expected, rtol=1e-4)


def test_pos2posemb3d_matches_oracle():
    rng = np.random.RandomState(0)
    pos = rng.rand(5, 3).astype(np.float32)
    got = np.asarray(pos2posemb3d(jnp.asarray(pos)))
    want = np_pos2posemb3d(pos.astype(np.float64))
    assert got.shape == (5, 384)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_lid_depth_bins():
    d = np.asarray(depth_bins(64, 1.0, 61.2, "LID"))
    # LID: d_i = start + bin * i * (i+1), bin = (max-start)/(D*(D+1))
    bin_size = (61.2 - 1.0) / (64 * 65)
    idx = np.arange(64)
    np.testing.assert_allclose(d, 1.0 + bin_size * idx * (idx + 1), rtol=1e-5)
    assert d[0] == pytest.approx(1.0)
    # last bin center: start + bin * (D-1) * D < depth_max by construction
    assert d[-1] == pytest.approx(1.0 + bin_size * 63 * 64, rel=1e-5)


def test_ud_depth_bins():
    d = np.asarray(depth_bins(10, 1.0, 11.0, "UD"))
    np.testing.assert_allclose(d, 1.0 + np.arange(10), rtol=1e-6)


def test_frustum_coords_layout():
    cd = depth_bins(4, 1.0, 10.0, "UD")
    c = np.asarray(frustum_coords(3, 5, 32.0, 80.0, cd))
    assert c.shape == (3, 5, 4, 4)
    # pixel (h=1, w=2), depth j: (u*d, v*d, d, 1) with u = w*pad_w/W, v = h*pad_h/H
    u, v = 2 * 80.0 / 5, 1 * 32.0 / 3
    d = np.asarray(cd)[2]
    np.testing.assert_allclose(c[1, 2, 2], [u * d, v * d, d, 1.0], rtol=1e-5)


def test_position_coords_3d_identity_projection():
    """With lidar2img = K @ I (simple pinhole), back-projection must invert it."""
    B, N, H, W, D = 1, 2, 4, 6, 8
    fx, fy, cx, cy = 100.0, 110.0, 60.0, 20.0
    K = np.array(
        [[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=np.float64
    )
    lidar2img = np.broadcast_to(K, (B, N, 4, 4))
    img2lidar = np.linalg.inv(lidar2img)
    pr = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    coords3d, mask = position_coords_3d(
        H, W, 40.0, 120.0, jnp.asarray(img2lidar, jnp.float32), pr, depth_num=D,
        depth_start=1.0, depth_mode="LID",
    )
    assert coords3d.shape == (B, N, H, W, D * 3)
    assert mask.shape == (B, N, H, W)
    # Check one pixel/depth by hand: world = K^-1 (u*d, v*d, d) = ((u-cx)/fx*d, ...)
    h, w, di = 2, 3, 5
    cd = np.asarray(depth_bins(D, 1.0, pr[3], "LID"))
    d = cd[di]
    u = w * 120.0 / W
    v = h * 40.0 / H
    world = np.array([(u - cx) / fx * d, (v - cy) / fy * d, d])
    want = (world - np.array(pr[:3])) / (np.array(pr[3:]) - np.array(pr[:3]))
    got = np.asarray(coords3d)[0, 0, h, w, di * 3 : di * 3 + 3]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_position_coords_channel_order_depth_major():
    """Channel c = d*3 + axis (depth-major) to match the reference flatten."""
    B, N, H, W, D = 1, 1, 2, 2, 3
    img2lidar = np.broadcast_to(np.eye(4), (B, N, 4, 4))
    coords3d, _ = position_coords_3d(
        H, W, 8.0, 8.0, jnp.asarray(img2lidar, jnp.float32),
        (-10, -10, -10, 10, 10, 10), depth_num=D, depth_start=1.0, depth_mode="UD",
    )
    c = np.asarray(coords3d)[0, 0, 0, 0].reshape(D, 3)
    # With identity projection, world z == depth bin value; z channel varies per d.
    cd = np.asarray(depth_bins(D, 1.0, 10.0, "UD"))
    np.testing.assert_allclose(c[:, 2], (cd + 10) / 20, atol=1e-5)


def test_sine_posemb_2d_shapes_and_values():
    masks = np.zeros((1, 2, 4, 5), np.bool_)
    pe = np.asarray(sine_posemb_2d_multiview(jnp.asarray(masks), num_feats=8))
    assert pe.shape == (1, 2, 4, 5, 24)
    # all-valid mask: normalized cumsum -> row 0 of y equals 1/H * 2pi scaling
    # spot check: the n-channel at camera 0 equals sin/cos of (1/2)*2pi / dim_t,
    # in the reference's block order [sins of even freqs | coss of odd freqs]
    dim_t = 10000.0 ** (2 * (np.arange(8) // 2) / 8)
    ang = (1.0 / (2.0 + 1e-6)) * 2 * np.pi / dim_t
    np.testing.assert_allclose(pe[0, 0, 0, 0, 0], np.sin(ang[0]), atol=1e-5)
    np.testing.assert_allclose(pe[0, 0, 0, 0, 4], np.cos(ang[1]), atol=1e-5)
    np.testing.assert_allclose(pe[0, 0, 0, 0, 1], np.sin(ang[2]), atol=1e-5)


def test_sine_posemb_mask_sensitivity():
    masks = np.zeros((1, 1, 4, 6), np.bool_)
    masks[..., 4:] = True  # right padding
    pe_pad = np.asarray(sine_posemb_2d_multiview(jnp.asarray(masks), num_feats=8))
    pe_full = np.asarray(
        sine_posemb_2d_multiview(jnp.zeros((1, 1, 4, 6), jnp.bool_), num_feats=8)
    )
    assert not np.allclose(pe_pad, pe_full)
