"""PETR / PETRv2 head behavior: shapes, center decode, masks, temporal."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from petr_tpu.models.petr_head import PETRHead
from petr_tpu.models.petrv2_head import PETRv2Head


def make_cams(B, N, seed=0):
    """Realistic-ish outward-facing cameras at z=0 looking horizontally."""
    rng = np.random.RandomState(seed)
    l2i = []
    for b in range(B):
        mats = []
        for i in range(N):
            yaw = 2 * np.pi * i / N
            # world->cam: cam x = right, y = down, z = forward
            R = np.array(
                [
                    [-np.sin(yaw), np.cos(yaw), 0],
                    [0, 0, -1],
                    [np.cos(yaw), np.sin(yaw), 0],
                ]
            )
            t = -R @ (np.array([np.cos(yaw), np.sin(yaw), 1.5]) * 1.0)
            E = np.eye(4)
            E[:3, :3] = R
            E[:3, 3] = t
            K = np.eye(4)
            K[0, 0], K[1, 1] = 400.0, 400.0
            K[0, 2], K[1, 2] = 400.0, 160.0
            mats.append(K @ E)
        l2i.append(mats)
    l2i = np.asarray(l2i)
    return np.linalg.inv(l2i).astype(np.float32)


HEAD_KW = dict(
    num_classes=10, embed_dim=32, num_query=20, num_layers=2, num_heads=4,
    ffn_dim=64, depth_num=8, remat=False,
)


def init_and_run(head, feats, img2lidar, img_hw, pad_hw, **kw):
    params = head.init(jax.random.PRNGKey(0), feats, img2lidar, img_hw, pad_hw, **kw)
    return params, head.apply(params, feats, img2lidar, img_hw, pad_hw, **kw)


def test_petr_head_shapes_and_center_range():
    B, N, H, W = 1, 6, 5, 10
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, H, W, 24))
    img2lidar = jnp.asarray(make_cams(B, N))
    img_hw = jnp.full((B, N, 2), jnp.asarray([160.0, 800.0]))
    head = PETRHead(**HEAD_KW)
    _, out = init_and_run(head, feats, img2lidar, img_hw, (160, 800))
    assert out["cls_logits"].shape == (2, B, 20, 10)
    assert out["bbox_codes"].shape == (2, B, 20, 10)
    codes = np.asarray(out["bbox_codes"])
    # centers denormalized into pc_range
    assert (codes[..., 0] >= -51.2).all() and (codes[..., 0] <= 51.2).all()
    assert (codes[..., 4] >= -5.0).all() and (codes[..., 4] <= 3.0).all()
    # cls bias init gives ~0.01 prior prob
    probs = 1 / (1 + np.exp(-np.asarray(out["cls_logits"])))
    assert probs.mean() < 0.1


def test_petr_head_padding_mask_invariance():
    B, N, H, W = 1, 2, 4, 8
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, H, W, 24))
    img2lidar = jnp.asarray(make_cams(B, N))
    # only left half of each image is valid
    img_hw = jnp.full((B, N, 2), jnp.asarray([128.0, 128.0]))
    head = PETRHead(**HEAD_KW)
    params = head.init(jax.random.PRNGKey(0), feats, img2lidar, img_hw, (128, 256))
    out1 = head.apply(params, feats, img2lidar, img_hw, (128, 256))
    # garbage in padded right-half features: queries must not see it
    feats2 = feats.at[:, :, :, 4:].set(1234.0)
    out2 = head.apply(params, feats2, img2lidar, img_hw, (128, 256))
    np.testing.assert_allclose(
        np.asarray(out1["cls_logits"]), np.asarray(out2["cls_logits"]), atol=1e-4
    )


def test_petrv2_head_time_normalization():
    B, N, H, W = 1, 12, 3, 6
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, H, W, 24))
    img2lidar = jnp.asarray(make_cams(B, N))
    img_hw = jnp.full((B, N, 2), jnp.asarray([96.0, 192.0]))
    ts1 = jnp.concatenate([jnp.zeros((B, 6)), jnp.full((B, 6), 0.5)], axis=1)
    ts2 = jnp.concatenate([jnp.zeros((B, 6)), jnp.full((B, 6), 0.25)], axis=1)
    head = PETRv2Head(**HEAD_KW, with_fpe=True, with_time=True, with_multi_reg=True)
    params = head.init(
        jax.random.PRNGKey(0), feats, img2lidar, img_hw, (96, 192), timestamp=ts1
    )
    out1 = head.apply(params, feats, img2lidar, img_hw, (96, 192), timestamp=ts1)
    out2 = head.apply(params, feats, img2lidar, img_hw, (96, 192), timestamp=ts2)
    v1 = np.asarray(out1["bbox_codes"])[..., 8:]
    v2 = np.asarray(out2["bbox_codes"])[..., 8:]
    np.testing.assert_allclose(v2, v1 * 2.0, rtol=1e-3)  # halved dt doubles velocity
    # non-velocity dims unchanged
    np.testing.assert_allclose(
        np.asarray(out1["bbox_codes"])[..., :8],
        np.asarray(out2["bbox_codes"])[..., :8],
        atol=1e-5,
    )


def test_petrv2_branches_not_shared():
    head = PETRv2Head(**HEAD_KW, with_fpe=False, with_time=False, with_multi_reg=False,
                      shared_branches=False)
    B, N, H, W = 1, 2, 3, 6
    feats = jnp.zeros((B, N, H, W, 24))
    img2lidar = jnp.asarray(make_cams(B, N))
    img_hw = jnp.full((B, N, 2), jnp.asarray([96.0, 192.0]))
    params = head.init(jax.random.PRNGKey(0), feats, img2lidar, img_hw, (96, 192))
    names = set(params["params"])
    assert "cls_branch_0" in names and "cls_branch_1" in names
    assert "reg_branch_0" in names and "reg_branch_1" in names
