"""Depthr depth branch: bin indices, depth maps, encoder, full head."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from petr_tpu.models.depth_encoder import (
    DepthGTEncoder,
    bin_depth_indices,
    gt_depth_maps,
    lid_bin_values,
)
from petr_tpu.models.depthr_head import DepthrHead
from petr_tpu.ops.boxes import box_corners
from tests.test_heads import make_cams


def test_bin_depth_indices_lid_roundtrip():
    """LID binning: bin centers map back to their own index.

    Centers sit exactly on integer indices, so fp32 sqrt noise can truncate
    one bin down (the torch reference has the same boundary behavior);
    allow off-by-one, forbid anything worse.
    """
    vals = np.asarray(lid_bin_values(80, 1e-3, 60.0))[:80]
    idx = np.asarray(bin_depth_indices(jnp.asarray(vals), "LID", 1e-3, 60.0, 80))
    assert (np.abs(idx - np.arange(80)) <= 1).all()
    assert (idx == np.arange(80)).mean() > 0.8


def test_bin_depth_out_of_range_overflow():
    d = jnp.asarray([0.0, -5.0, 100.0, np.nan])
    idx = np.asarray(bin_depth_indices(d, "LID", 1e-3, 60.0, 80))
    # 0.0 is below depth_min -> index < 0 -> overflow bin; others too
    assert (idx == 80).all()


def test_box_corners_axis_aligned():
    b = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 4.0, 6.0, 0.0, 0, 0]])
    c = np.asarray(box_corners(b))[0]
    assert c.shape == (8, 3)
    np.testing.assert_allclose(sorted(set(np.round(c[:, 0], 5))), [-1, 1])
    np.testing.assert_allclose(sorted(set(np.round(c[:, 1], 5))), [-2, 2])
    np.testing.assert_allclose(sorted(set(np.round(c[:, 2], 5))), [-3, 3])
    # yaw=pi/2 swaps x/y extents
    b2 = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 4.0, 6.0, np.pi / 2, 0, 0]])
    c2 = np.asarray(box_corners(b2))[0]
    np.testing.assert_allclose(sorted(set(np.round(c2[:, 0], 4))), [-2, 2])


def test_gt_depth_maps_nearest_wins():
    """Two boxes in front of one camera: overlapping pixels take the nearer."""
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 100.0
    K[0, 2], K[1, 2] = 64.0, 32.0
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)  # looks along +x
    E = np.eye(4)
    E[:3, :3] = R
    l2i = jnp.asarray((K @ E)[None, None], jnp.float32)  # (1, 1, 4, 4)
    boxes = jnp.asarray(
        [[[10.0, 0, 0, 2, 2, 2, 0, 0, 0], [20.0, 0, 0, 4, 4, 4, 0, 0, 0]]],
        jnp.float32,
    )
    valid = jnp.ones((1, 2), bool)
    dm = np.asarray(gt_depth_maps(boxes, valid, l2i, (64, 128), down_scale=8))
    assert dm.shape == (1, 1, 8, 16)
    center = dm[0, 0, 4, 8]
    assert center == pytest.approx(10.0, abs=0.1)  # nearer box wins
    assert (dm > 0).any()


def test_depth_encoder_shapes():
    enc = DepthGTEncoder(num_bins=16, down_scale=4, embed_dim=32)
    onehot = jax.nn.one_hot(
        jnp.zeros((1, 2, 16, 24), jnp.int32), 17, dtype=jnp.float32
    )
    params = enc.init(jax.random.PRNGKey(0), onehot)
    emb, wd = enc.apply(params, onehot)
    assert emb.shape == (1, 2, 4, 6, 32)
    assert wd.shape == (1, 2, 4, 6)


@pytest.mark.slow
def test_depthr_head_forward():
    B, N, H, W = 1, 2, 2, 4  # feature grid at stride 32 of 64x128 input
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, N, H, W, 24))
    img2lidar = jnp.asarray(make_cams(B, N))
    lidar2img = jnp.asarray(np.linalg.inv(np.asarray(img2lidar)))
    img_hw = jnp.full((B, N, 2), jnp.asarray([64.0, 128.0]))
    gt = jnp.asarray(
        np.concatenate(
            [np.random.RandomState(0).uniform(-20, 20, (B, 4, 2)),
             np.zeros((B, 4, 1)), np.full((B, 4, 3), 2.0),
             np.zeros((B, 4, 3))], -1
        ), jnp.float32,
    )
    valid = jnp.ones((B, 4), bool)
    head = DepthrHead(
        num_classes=10, embed_dim=32, num_query=12, num_layers=2, num_heads=4,
        ffn_dim=64, depth_num=4, depth_bins=8, remat=False,
    )
    params = head.init(
        jax.random.PRNGKey(1), feats, img2lidar, img_hw, (64, 128),
        gt_boxes=gt, gt_valid=valid, lidar2img=lidar2img,
    )
    out = head.apply(
        params, feats, img2lidar, img_hw, (64, 128),
        gt_boxes=gt, gt_valid=valid, lidar2img=lidar2img,
    )
    assert out["cls_logits"].shape == (2, B, 12, 10)
    assert np.isfinite(np.asarray(out["bbox_codes"])).all()
