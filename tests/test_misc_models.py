"""Smaller parity components: DGCNN family, learned PE, NormedLinear,
softmax coder, IoU utils, photometric aug."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from petr_tpu.models.dgcnn import DGCNNAttn, DGCNN3DHead, ObjDGCNN, pillar_scatter
from petr_tpu.models.positional import LearnedPositionalEncoding3D
from petr_tpu.models.petr_head import NormedLinear
from petr_tpu.ops.nms_free import nms_free_decode_softmax
from petr_tpu.ops.iou3d import bev_iou, iou_3d, nms_bev
from petr_tpu.data.transforms import photometric_distortion


def test_pillar_scatter():
    pts = jnp.asarray([[0.0, 0.0, 0.0, 5.0], [0.1, 0.1, 1.0, 7.0], [999.0, 0, 0, 1]])
    valid = jnp.ones(3, bool)
    g = pillar_scatter(pts, valid, (-51.2, -51.2, -5, 51.2, 51.2, 3), (16, 16))
    g = np.asarray(g)
    assert g.shape == (16, 16, 5)
    # both near-origin points land in the center cell, averaged; OOB dropped
    center = g[8, 8]
    assert center[-1] == 1.0  # occupancy
    np.testing.assert_allclose(center[3], 6.0, atol=1e-5)
    assert g[..., -1].sum() == 1.0  # only one occupied cell


def test_dgcnn_attn_shapes():
    m = DGCNNAttn(embed_dim=16, K=4)
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    params = m.init(jax.random.PRNGKey(1), q)
    out = m.apply(params, q)
    assert out.shape == (2, 10, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_objdgcnn_end_to_end():
    m = ObjDGCNN(embed_dim=32, grid_hw=(16, 16), num_query=8, num_layers=2)
    pts = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 4), minval=-40, maxval=40)
    valid = jnp.ones((1, 64), bool)
    params = m.init(jax.random.PRNGKey(1), pts, valid)
    out = m.apply(params, pts, valid)
    assert out["cls_logits"].shape == (2, 1, 8, 10)
    assert np.isfinite(np.asarray(out["bbox_codes"])).all()


def test_learned_pe_shapes():
    m = LearnedPositionalEncoding3D(num_feats=8)
    masks = jnp.zeros((1, 3, 5, 7), bool)
    params = m.init(jax.random.PRNGKey(0), masks)
    pe = m.apply(params, masks)
    assert pe.shape == (1, 3, 5, 7, 24)


def test_normed_linear_scale_invariance():
    m = NormedLinear(out=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 8))
    params = m.init(jax.random.PRNGKey(1), x)
    y1 = m.apply(params, x)
    y2 = m.apply(params, x * 100.0)  # normalized features: scale-invariant
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-3)


def test_softmax_coder():
    logits = np.full((6, 11), -5.0, np.float32)
    logits[2, 3] = 5.0  # one confident foreground
    logits[:, 10] = 2.0  # background class
    codes = np.zeros((6, 10), np.float32)
    out = nms_free_decode_softmax(
        jnp.asarray(logits), jnp.asarray(codes), max_num=3, num_classes=10,
        post_center_range=[-61.2, -61.2, -10, 61.2, 61.2, 10],
    )
    assert int(out["labels"][0]) == 3
    assert float(out["scores"][0]) > 0.9


def test_bev_iou_identical_and_disjoint():
    a = np.array([[0, 0, 0, 2, 4, 2, 0.3]])
    b = np.array([[0, 0, 0, 2, 4, 2, 0.3], [100, 0, 0, 2, 4, 2, 0.0]])
    iou = bev_iou(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
    assert iou[0, 1] == 0.0


def test_iou3d_z_overlap():
    a = np.array([[0, 0, 0.0, 2, 2, 2, 0.0]])
    b = np.array([[0, 0, 1.0, 2, 2, 2, 0.0]])  # half z overlap
    iou = iou_3d(a, b)
    np.testing.assert_allclose(iou[0, 0], (4 * 1) / (8 + 8 - 4), atol=1e-6)


def test_iou_rotated_45deg():
    a = np.array([[0, 0, 0, 2, 2, 2, 0.0]])
    b = np.array([[0, 0, 0, 2, 2, 2, np.pi / 4]])
    iou = bev_iou(a, b)
    # square vs 45deg-rotated square: IoU = 2(sqrt(2)-1)/(2-(2)(sqrt2 -1))... just bounds
    assert 0.6 < iou[0, 0] < 0.8


def test_nms_bev():
    boxes = np.array([[0, 0, 0, 2, 4, 2, 0.0], [0.1, 0, 0, 2, 4, 2, 0.0], [20, 0, 0, 2, 4, 2, 0.0]])
    keep = nms_bev(boxes, np.array([0.9, 0.8, 0.7]), iou_thr=0.5)
    assert list(keep) == [0, 2]


def test_photometric_distortion_runs():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (16, 24, 3)).astype(np.float32)
    out = photometric_distortion(img, rng)
    assert out.shape == img.shape
    assert np.isfinite(out).all()


def test_pillar_decorate_offsets():
    """PointPillars decoration: cluster-mean and pillar-center offsets."""
    from petr_tpu.models.dgcnn import pillar_decorate

    pr = (-8.0, -8.0, -5.0, 8.0, 8.0, 3.0)
    # two points in the same pillar (16x16 grid -> 1m cells), one OOB
    pts = jnp.asarray([
        [0.25, 0.25, 0.0, 5.0],
        [0.75, 0.75, 1.0, 7.0],
        [99.0, 0.0, 0.0, 1.0],
    ])
    dec, flat, inb = pillar_decorate(pts, jnp.ones(3, bool), pr, (16, 16))
    dec, flat, inb = map(np.asarray, (dec, flat, inb))
    assert inb.tolist() == [True, True, False]
    assert flat[0] == flat[1] and flat[2] == 16 * 16  # dump slot
    # cluster mean = (0.5, 0.5, 0.5); offsets +-0.25 in xy, +-0.5 z
    np.testing.assert_allclose(dec[0, 4:7], [-0.25, -0.25, -0.5], atol=1e-6)
    np.testing.assert_allclose(dec[1, 4:7], [0.25, 0.25, 0.5], atol=1e-6)
    # pillar center (0.5, 0.5): center offsets
    np.testing.assert_allclose(dec[0, 7:9], [-0.25, -0.25], atol=1e-6)
    # OOB point fully zeroed
    assert (dec[2] == 0).all()


def test_pillar_feature_net_scatter_max_oracle():
    """The canvas value of a pillar equals the elementwise MAX over the
    relu'd point MLP outputs of the points in that pillar (PointPillars
    max-over-K, computed here as a scatter-max)."""
    from petr_tpu.models.dgcnn import PillarFeatureNet, pillar_decorate

    pr = (-8.0, -8.0, -5.0, 8.0, 8.0, 3.0)
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [rng.uniform(-7, 7, (1, 32, 2)), rng.uniform(-2, 2, (1, 32, 1)),
         rng.uniform(0, 10, (1, 32, 1))], -1
    ).astype(np.float32)
    valid = np.ones((1, 32), bool)
    m = PillarFeatureNet(out_channels=16, pc_range=pr, grid_hw=(16, 16))
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(valid))
    canvas = np.asarray(m.apply(params, jnp.asarray(pts), jnp.asarray(valid)))
    assert canvas.shape == (1, 16, 16, 16)

    # oracle: run the MLP via apply on decorated points, group by pillar id
    dec, flat, inb = pillar_decorate(jnp.asarray(pts[0]), jnp.ones(32, bool), pr, (16, 16))
    k = np.asarray(params["params"]["pfn_fc"]["kernel"])
    h = np.asarray(dec) @ k
    mu = h.mean(-1, keepdims=True)
    sd = h.std(-1, keepdims=True)
    ln = params["params"]["pfn_norm"]
    h = (h - mu) / np.sqrt(sd**2 + 1e-6) * np.asarray(ln["scale"]) + np.asarray(ln["bias"])
    h = np.maximum(h, 0.0)
    flat = np.asarray(flat)
    for pid in np.unique(flat[np.asarray(inb)]):
        want = h[flat == pid].max(0)
        gy, gx = divmod(int(pid), 16)
        np.testing.assert_allclose(canvas[0, gy, gx], want, atol=1e-4)
    # empty pillars are zero
    empty = np.setdiff1d(np.arange(256), flat[np.asarray(inb)])
    gy, gx = divmod(int(empty[0]), 16)
    np.testing.assert_allclose(canvas[0, gy, gx], 0.0)


def test_second_backbone_and_fpn_shapes():
    from petr_tpu.models.dgcnn import SECONDBackbone, SECONDFPN

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 8))
    bb = SECONDBackbone(channels=(8, 16, 32), layer_nums=(1, 1, 1))
    params = bb.init(jax.random.PRNGKey(1), x)
    stages = bb.apply(params, x)
    assert [tuple(s.shape) for s in stages] == [
        (1, 8, 8, 8), (1, 4, 4, 16), (1, 2, 2, 32)]
    neck = SECONDFPN(out_channels=(8, 8, 8), upsample_strides=(1, 2, 4))
    nparams = neck.init(jax.random.PRNGKey(2), stages)
    bev = neck.apply(nparams, stages)
    assert bev.shape == (1, 8, 8, 24)
