"""Streaming PETRv2 (feature-cached) vs the full 12-view forward (CPU).

The streaming runtime must be exact: caching the previous frame's
backbone+neck features and recomputing only the head must reproduce the full
detector forward on the concatenated 12-view input bit-for-math (same params,
same ops — only the backbone batch grouping differs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from petr_tpu.models import PETRDetector
from petr_tpu.models.detector import PETRFeatureNet, PETRHeadNet
from petr_tpu.serve import StreamingPETRv2, self_padded_timestamp
from tests.test_petrv2_e2e import v2_tiny_config


def _frame(rng, B, N, H, W):
    images = rng.standard_normal((B, N, H, W, 3)).astype(np.float32)
    # plausible img2lidar: identity-ish with jitter, well-conditioned
    i2l = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    i2l[..., :3, 3] = rng.uniform(-2, 2, (B, N, 3))
    img_hw = np.tile(np.array([H, W], np.float32), (B, N, 1))
    return images, i2l, img_hw


def test_streaming_matches_full_forward():
    cfg = v2_tiny_config()
    H, W = cfg.data.image_size
    B, N = 1, 6
    rng = np.random.default_rng(0)

    img_a, i2l_a, hw_a = _frame(rng, B, N, H, W)
    img_b, i2l_b, hw_b = _frame(rng, B, N, H, W)

    # 12-view composites, current frame first (data layer convention)
    images12 = np.concatenate([img_b, img_a], axis=1)
    i2l12 = np.concatenate([i2l_b, i2l_a], axis=1)
    hw12 = np.concatenate([hw_b, hw_a], axis=1)
    ts12 = np.concatenate(
        [np.zeros((B, N), np.float32), np.full((B, N), 0.5, np.float32)], axis=1
    )

    model = PETRDetector(cfg.model, deterministic=True)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(images12),
        jnp.asarray(i2l12),
        jnp.asarray(hw12),
        timestamp=jnp.asarray(ts12),
    )["params"]

    full = model.apply(
        {"params": params},
        jnp.asarray(images12),
        jnp.asarray(i2l12),
        jnp.asarray(hw12),
        timestamp=jnp.asarray(ts12),
    )

    s = StreamingPETRv2(cfg, params, decode=False)
    # frame 0: self-padded prev
    ts0 = self_padded_timestamp(np.zeros((B, N), np.float32))
    s.step(img_a, np.concatenate([i2l_a, i2l_a], 1), np.concatenate([hw_a, hw_a], 1), ts0)
    # frame 1: cached features of frame 0 stand in for the prev views
    out = s.step(img_b, i2l12, hw12, ts12)

    np.testing.assert_allclose(
        np.asarray(out["cls_logits"]), np.asarray(full["cls_logits"]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["bbox_codes"]), np.asarray(full["bbox_codes"]),
        rtol=1e-4, atol=1e-4,
    )


def test_streaming_first_frame_and_reset():
    cfg = v2_tiny_config()
    H, W = cfg.data.image_size
    B, N = 1, 6
    rng = np.random.default_rng(1)
    img, i2l, hw = _frame(rng, B, N, H, W)
    i2l12 = np.concatenate([i2l, i2l], axis=1)
    hw12 = np.concatenate([hw, hw], axis=1)
    ts12 = self_padded_timestamp(np.zeros((B, N), np.float32))

    model = PETRDetector(cfg.model, deterministic=True)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, 2 * N, H, W, 3)),
        jnp.asarray(i2l12),
        jnp.asarray(hw12),
        timestamp=jnp.asarray(ts12),
    )["params"]

    s = StreamingPETRv2(cfg, params, decode=True)
    det = s.step(img, i2l12, hw12, ts12)
    assert np.isfinite(np.asarray(det["boxes"])).all()
    assert s._prev_feats is not None
    s.reset()
    assert s._prev_feats is None
    # wrong view count is rejected
    with pytest.raises(ValueError):
        s.step(np.zeros((B, 12, H, W, 3), np.float32), i2l12, hw12, ts12)


def test_align_prev_lidar2img_projects_static_points_identically():
    """A world-fixed point projects to the same pixel through the prev-frame
    lidar2img whether addressed in prev-lidar coords (offline info path) or in
    current-lidar coords through the aligned matrix (streaming path)."""
    from petr_tpu.serve.streaming import align_prev_lidar2img, lidar2global

    rng = np.random.default_rng(3)

    def rand_pose():
        a = rng.uniform(-np.pi, np.pi)
        R = np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
        )
        return R, rng.uniform(-10, 10, 3)

    prev_l2g = lidar2global(*rand_pose(), *rand_pose())
    cur_l2g = lidar2global(*rand_pose(), *rand_pose())
    prev_l2i = rng.standard_normal((2, 4, 4))  # arbitrary projective maps

    p_global = np.append(rng.uniform(-5, 5, 3), 1.0)
    p_prev = np.linalg.inv(prev_l2g) @ p_global
    p_cur = np.linalg.inv(cur_l2g) @ p_global

    aligned = align_prev_lidar2img(prev_l2i, prev_l2g, cur_l2g)
    np.testing.assert_allclose(aligned @ p_cur, prev_l2i @ p_prev, atol=1e-9)


def test_streaming_sample_matches_prev_keyframe(tmp_path):
    """streaming_sample finds the previous keyframe among the sweep records
    (same data_path) and reuses its ego-aligned matrices; a non-adjacent
    prev_info (scene boundary) self-pads with cached=False."""
    from petr_tpu.configs.config import DataConfig
    from petr_tpu.data import NuScenesDataset
    from tests.test_data import make_synth_infos

    infos = make_synth_infos(tmp_path, n=3, n_prev=2)
    dcfg = DataConfig(image_size=(32, 80), final_dim=(32, 80), max_gt=8, num_frames=2)
    ds = NuScenesDataset(infos, dcfg, training=False, src_hw=(90, 160), sweep_range=(0, 2))

    s0 = ds.streaming_sample(0, None)
    assert not s0["cached"]  # scene start: primable stored sweep, not cached
    assert s0["images"].shape == (6, 32, 80, 3)
    assert s0["img2lidar"].shape == (12, 4, 4)
    # padded prev timestamps carry the mean-sweep offset
    assert (s0["timestamp"][6:] > s0["timestamp"][:6]).all()

    s1 = ds.streaming_sample(1, infos[0])
    assert s1["cached"]
    # the matched sweep's matrices equal the offline path's for that entry
    sweep = infos[1]["sweeps_cams"][0]
    assert sweep["CAM_FRONT"]["data_path"] == infos[0]["cams"]["CAM_FRONT"]["data_path"]

    # prev frame 2 keyframes back still resolves (it is in the sweep list,
    # with its own ego-aligned matrices)
    s2 = ds.streaming_sample(2, infos[0])
    assert s2["cached"]

    # a frame from another scene (path not in this sample's sweeps): padding
    foreign = {"cams": {"CAM_FRONT": {"data_path": "other_scene.jpg"}}}
    s3 = ds.streaming_sample(2, foreign)
    assert not s3["cached"]


def test_streaming_primed_scene_start_matches_full_eval(tmp_path):
    """Scene-start frames: priming the cache with the stored sweep's views
    (`streaming_sample`'s ``prev_images``) reproduces the full 12-view
    forward EXACTLY — no pad_empty degradation at scene boundaries, so
    `cli.test --streaming` matches the offline eval on every frame."""
    import dataclasses

    from petr_tpu.configs import get_config
    from petr_tpu.data import NuScenesDataset
    from petr_tpu.data.synthetic import generate_synthetic_scenes

    cfg = get_config("tiny_debug_v2")
    splits = generate_synthetic_scenes(
        str(tmp_path), n_scenes=1, frames_per_scene=2, image_hw=(32, 80),
        n_objects=3, val_scenes=0,
    )
    dcfg = dataclasses.replace(cfg.data, src_hw=(32, 80))
    ds = NuScenesDataset(splits["train"], dcfg, training=False, src_hw=(32, 80))

    # offline eval sample 0: scene start — its prev frame is the warmup sweep
    full_smp = ds.get(0)
    model = PETRDetector(cfg.model, deterministic=True)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(full_smp["images"][None]),
        jnp.asarray(full_smp["img2lidar"][None]),
        jnp.asarray(full_smp["img_hw"][None]),
        timestamp=jnp.asarray(full_smp["timestamp"][None]),
    )["params"]
    full = model.apply(
        {"params": params},
        jnp.asarray(full_smp["images"][None]),
        jnp.asarray(full_smp["img2lidar"][None]),
        jnp.asarray(full_smp["img_hw"][None]),
        timestamp=jnp.asarray(full_smp["timestamp"][None]),
    )

    smp = ds.streaming_sample(0, None)
    assert not smp["cached"]
    assert smp["prev_images"] is not None  # stored sweep surfaced for priming
    np.testing.assert_allclose(smp["img2lidar"], full_smp["img2lidar"], atol=1e-6)
    np.testing.assert_allclose(smp["timestamp"], full_smp["timestamp"], atol=1e-6)

    s = StreamingPETRv2(cfg, params, decode=False)
    s.reset()
    s.prime(smp["prev_images"][None])
    out = s.step(
        smp["images"][None], smp["img2lidar"][None], smp["img_hw"][None],
        smp["timestamp"][None],
    )
    np.testing.assert_allclose(
        np.asarray(out["cls_logits"]), np.asarray(full["cls_logits"]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["bbox_codes"]), np.asarray(full["bbox_codes"]),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.slow
def test_streaming_eval_cli(tmp_path, monkeypatch, capsys):
    """cli.test --streaming end-to-end on synthetic 2-frame data."""
    import pickle
    import sys

    from petr_tpu.cli import test as test_cli
    from tests.test_data import make_synth_infos

    infos = make_synth_infos(tmp_path, n=3, n_prev=2)
    pkl = tmp_path / "infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "synthetic"}}, f)

    monkeypatch.setattr(
        sys, "argv",
        ["test", "--config", "tiny_debug_v2", "--infos", str(pkl), "--streaming"],
    )
    test_cli.main()
    out = capsys.readouterr().out
    assert "frames served from the feature cache" in out
    assert "mAP" in out or "nds" in out.lower()


def test_feature_and_head_slices_share_detector_params():
    """PETRFeatureNet/PETRHeadNet param trees are subtrees of PETRDetector's."""
    cfg = v2_tiny_config()
    H, W = cfg.data.image_size
    B, N = 1, 12
    images = jnp.zeros((B, N, H, W, 3))
    i2l = jnp.tile(jnp.eye(4), (B, N, 1, 1))
    hw = jnp.tile(jnp.asarray([H, W], jnp.float32), (B, N, 1))
    ts = jnp.zeros((B, N))

    det_params = PETRDetector(cfg.model).init(
        jax.random.PRNGKey(0), images, i2l, hw, timestamp=ts
    )["params"]
    feat_params = PETRFeatureNet(cfg.model).init(jax.random.PRNGKey(0), images)["params"]
    feats = PETRFeatureNet(cfg.model).apply({"params": det_params}, images)
    head_params = PETRHeadNet(cfg.model, (H, W)).init(
        jax.random.PRNGKey(0), feats, i2l, hw, timestamp=ts
    )["params"]

    det_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(det_params)}
    for sub in (feat_params, head_params):
        for p, _ in jax.tree_util.tree_leaves_with_path(sub):
            assert jax.tree_util.keystr(p) in det_paths


@pytest.mark.slow
def test_streaming_int8_matches_full_int8_eval():
    """int8 PTQ backbone composes with the streaming runtime: streaming decode
    == the full 12-view int8 eval step (same calibrated scales)."""
    import dataclasses

    from petr_tpu.quant import calibrate_detector
    from petr_tpu.serve import StreamingPETRv2

    cfg = v2_tiny_config()
    H, W = cfg.data.image_size
    B, N = 1, 6
    rng = np.random.default_rng(11)
    img_a, i2l_a, hw_a = _frame(rng, B, N, H, W)
    img_b, i2l_b, hw_b = _frame(rng, B, N, H, W)
    images12 = np.concatenate([img_b, img_a], axis=1)
    i2l12 = np.concatenate([i2l_b, i2l_a], axis=1)
    hw12 = np.concatenate([hw_b, hw_a], axis=1)
    ts12 = np.concatenate(
        [np.zeros((B, N), np.float32), np.full((B, N), 0.5, np.float32)], axis=1
    )
    batch = {
        "images": jnp.asarray(images12), "img2lidar": jnp.asarray(i2l12),
        "img_hw": jnp.asarray(hw12), "timestamp": jnp.asarray(ts12),
    }

    model = PETRDetector(cfg.model, deterministic=True)
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["img2lidar"],
        batch["img_hw"], timestamp=batch["timestamp"],
    )["params"]
    scales = calibrate_detector(cfg, params, [batch])

    qmodel = dataclasses.replace(
        cfg.model,
        backbone=dataclasses.replace(cfg.model.backbone, quant="int8"),
    )
    full = jax.device_get(
        PETRDetector(qmodel, deterministic=True).apply(
            {"params": params, "quant": scales},
            batch["images"], batch["img2lidar"], batch["img_hw"],
            timestamp=batch["timestamp"],
        )
    )

    # raw head outputs (decoded top-k order is tie-sensitive on an untrained
    # model, so compare pre-decode)
    s = StreamingPETRv2(cfg, params, decode=False, quant_scales=scales)
    s.step(img_a, np.concatenate([i2l_a, i2l_a], 1),
           np.concatenate([hw_a, hw_a], 1),
           self_padded_timestamp(np.zeros((B, N), np.float32)))
    out = jax.device_get(s.step(img_b, i2l12, hw12, ts12))

    # jit (streaming) vs eager (full) fuse the int8 dequant epilogue
    # differently; observed max rel diff ~4e-4
    np.testing.assert_allclose(out["cls_logits"], full["cls_logits"], rtol=2e-3, atol=2e-3)
    # codes span the pc_range (~±61 m): absolute 2 cm tolerance
    np.testing.assert_allclose(out["bbox_codes"], full["bbox_codes"], rtol=2e-3, atol=2e-2)

    # the decode path composes too (finite boxes end-to-end)
    sd = StreamingPETRv2(cfg, params, decode=True, quant_scales=scales)
    det = jax.device_get(sd.step(img_b, i2l12, hw12, ts12))
    assert np.isfinite(det["boxes"]).all()
