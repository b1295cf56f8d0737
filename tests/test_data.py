"""Data pipeline: IDA geometry consistency, BEV aug coherence, loader."""

import numpy as np
import pytest
from PIL import Image

from petr_tpu.configs.config import DataConfig
from petr_tpu.data.dataset import Loader, NuScenesDataset, cam_matrices, collate_batch
from petr_tpu.data.transforms import (
    IdaParams,
    apply_ida,
    bev_rotate_scale,
    compose_lidar2img,
    ida_matrix,
    normalize_image,
    pad_image,
    sample_ida_params,
    update_intrinsics_ida,
)


def project(l2i, p3):
    q = l2i @ np.array([*p3, 1.0])
    return q[:2] / q[2]


def test_ida_matrix_tracks_pixels():
    """A world point projected with updated intrinsics must land where the
    image op sequence moved its pixel."""
    rng = np.random.default_rng(0)
    for flip in (False, True):
        p = IdaParams(resize=0.5, resize_dims=(800, 450), crop=(40, 80, 840 - 40 - 0, 80 + 320), flip=flip, rotate_deg=0.0)
        # adjust crop to final dims 800x320 -> (40, 80, 840, 400) invalid; use proper
        p = IdaParams(0.5, (800, 450), (0, 130, 800, 450), flip, 0.0)
        M = ida_matrix(p)
        # pixel u,v in source image -> resize*u - crop_x etc.
        u, v = 600.0, 400.0
        q = M @ np.array([u, v, 1.0])
        exp_u = 0.5 * u - 0
        exp_v = 0.5 * v - 130
        if flip:
            exp_u = 800 - exp_u
        np.testing.assert_allclose(q[:2], [exp_u, exp_v], atol=1e-6)


def test_ida_rotation_about_center():
    p = IdaParams(1.0, (100, 100), (0, 0, 100, 100), False, 90.0)
    M = ida_matrix(p)
    # center is fixed
    np.testing.assert_allclose(M @ np.array([50, 50, 1.0]), [50, 50, 1.0], atol=1e-6)


def test_update_intrinsics_then_compose():
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 500.0
    K[0, 2], K[1, 2] = 800.0, 450.0
    E = np.eye(4)
    p = IdaParams(0.5, (800, 450), (0, 130, 800, 450), False, 0.0)
    Knew = update_intrinsics_ida(K, p)
    l2i = compose_lidar2img(Knew, E)
    # world point at (x, y, z=depth) projected with scaled/cropped intrinsics
    pt = np.array([1.0, 0.5, 10.0])
    uv0 = project(compose_lidar2img(K, E), pt)
    uv1 = project(l2i, pt)
    np.testing.assert_allclose(uv1, uv0 * 0.5 - [0, 130], atol=1e-6)


def test_bev_rotate_scale_projection_consistency():
    """After world rot+scale, transformed box centers project to the same
    pixels through the updated lidar2img."""
    rng = np.random.default_rng(0)
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 500.0
    K[0, 2], K[1, 2] = 400.0, 200.0
    # camera looking along +x, world z up
    E = np.eye(4)
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    Et = np.eye(4)
    Et[:3, :3] = R
    l2i = (K @ Et)[None]  # (1, 4, 4)
    boxes = np.array([[10.0, 2.0, -1.0, 2.0, 4.0, 1.5, 0.3, 1.0, 0.5]])
    uv_before = project(l2i[0], boxes[0, :3])
    l2i2, boxes2 = bev_rotate_scale(l2i, boxes, rng)
    uv_after = project(l2i2[0], boxes2[0, :3])
    np.testing.assert_allclose(uv_after, uv_before, atol=1e-4)
    # dims scaled by the same factor everywhere
    s = boxes2[0, 3] / boxes[0, 3]
    np.testing.assert_allclose(boxes2[0, 3:6], boxes[0, 3:6] * s, rtol=1e-6)


def test_normalize_and_pad():
    img = np.full((10, 20, 3), 100.0, np.float32)
    out = normalize_image(img, (50, 50, 50), (2, 2, 2))
    np.testing.assert_allclose(out, 25.0)
    padded = pad_image(out, (16, 32))
    assert padded.shape == (16, 32, 3)
    assert (padded[10:] == 0).all() and (padded[:, 20:] == 0).all()


def test_eval_ida_deterministic():
    rng = np.random.default_rng(0)
    a = sample_ida_params(rng, (900, 1600), (320, 800), (0.47, 0.625), training=False)
    b = sample_ida_params(rng, (900, 1600), (320, 800), (0.47, 0.625), training=False)
    assert a == b
    assert a.resize == pytest.approx(0.5)  # max(320/900, 800/1600)
    assert a.crop[2] - a.crop[0] == 800 and a.crop[3] - a.crop[1] == 320


def make_synth_infos(tmp_path, n=4, n_prev=2):
    """Synthetic info records with tiny on-disk images."""
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir(exist_ok=True)
    from petr_tpu.data.dataset import CAM_ORDER

    def make_cam(i, t):
        path = img_dir / f"{i}_{t}.jpg"
        Image.fromarray(rng.integers(0, 255, (90, 160, 3), dtype=np.uint8).astype(np.uint8)).save(path)
        yaw = 2 * np.pi * i / 6
        return {
            "data_path": str(path),
            "timestamp": t,
            "cam_intrinsic": np.array([[400.0, 0, 80], [0, 400.0, 45], [0, 0, 1]]),
            "sensor2lidar_rotation": np.array(
                [[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
            ),
            "sensor2lidar_translation": rng.normal(0, 1, 3),
        }

    infos = []
    for s in range(n):
        t0 = 100.0 + s * 0.5
        ego_yaw = 0.1 * s
        infos.append(
            {
                "token": f"tok{s}",
                "timestamp": t0,
                "lidar_path": "x",
                # pose chain (quaternions, w x y z) for the submission path
                "lidar2ego_translation": np.array([0.9, 0.0, 1.8]),
                "lidar2ego_rotation": np.array([1.0, 0.0, 0.0, 0.0]),
                "ego2global_translation": np.array([10.0 * s, 5.0, 0.0]),
                "ego2global_rotation": np.array(
                    [np.cos(ego_yaw / 2), 0.0, 0.0, np.sin(ego_yaw / 2)]),
                "cams": {c: make_cam(i, t0) for i, c in enumerate(CAM_ORDER)},
                "sweeps_cams": [
                    {c: make_cam(i, t0 - 0.5 * (k + 1)) for i, c in enumerate(CAM_ORDER)}
                    for k in range(n_prev)
                ],
                "gt_boxes": np.concatenate(
                    [
                        rng.uniform(-30, 30, (5, 2)),
                        rng.uniform(-2, 0, (5, 1)),
                        rng.uniform(1, 3, (5, 3)),
                        rng.uniform(-np.pi, np.pi, (5, 1)),
                    ],
                    -1,
                ),
                "gt_velocity": rng.normal(0, 2, (5, 2)),
                "gt_labels": rng.integers(0, 10, 5),
                "valid_flag": np.ones(5, bool),
            }
        )
    return infos


def test_dataset_sample_shapes(tmp_path):
    infos = make_synth_infos(tmp_path)
    cfg = DataConfig(image_size=(32, 80), final_dim=(32, 80), max_gt=8)
    ds = NuScenesDataset(infos, cfg, training=True, src_hw=(90, 160))
    s = ds.get(0, seed=7)
    assert s["images"].shape == (6, 32, 80, 3)
    assert s["img2lidar"].shape == (6, 4, 4)
    assert s["gt_boxes"].shape == (8, 9)
    assert s["gt_valid"].sum() <= 5
    # img2lidar really is the inverse
    np.testing.assert_allclose(
        s["img2lidar"][0] @ s["lidar2img"][0], np.eye(4), atol=1e-3
    )


def test_dataset_v2_two_frames(tmp_path):
    infos = make_synth_infos(tmp_path)
    cfg = DataConfig(image_size=(32, 80), final_dim=(32, 80), max_gt=8, num_frames=2)
    ds = NuScenesDataset(infos, cfg, training=False, src_hw=(90, 160), sweep_range=(0, 2))
    s = ds.get(1, seed=0)
    assert s["images"].shape == (12, 32, 80, 3)
    ts = s["timestamp"].reshape(2, 6)
    assert (ts[0] == 0).all()  # current frame at reference time
    # reference sign (lidar - img, loading.py:65): earlier image -> POSITIVE
    assert (ts[1] > 0).all()


def test_loader_deterministic_order(tmp_path):
    infos = make_synth_infos(tmp_path)
    cfg = DataConfig(image_size=(32, 80), final_dim=(32, 80), max_gt=8)
    ds = NuScenesDataset(infos, cfg, training=True, src_hw=(90, 160))
    loader = Loader(ds, batch_size=2, seed=0, num_threads=2)
    a = [b["tokens"] for b in loader.epoch(0)]
    b = [b["tokens"] for b in loader.epoch(0)]
    assert a == b
    assert len(a) == 2
    c = [b["tokens"] for b in loader.epoch(1)]
    assert a != c  # reshuffled


def test_albu_multiview_requires_optional_dep():
    import pytest
    from petr_tpu.data.transforms import albu_multiview

    try:
        import albumentations  # noqa: F401
        has_albu = True
    except ImportError:
        has_albu = False
    if has_albu:
        fn = albu_multiview([])
        assert callable(fn)
    else:
        with pytest.raises(ImportError, match="albumentations"):
            albu_multiview([])


def test_corrupt_camera_matrix_sanitized(tmp_path):
    """NaN/singular calibration must not crash the loader or leak NaN into
    img2lidar — corrupt views get a far-away back-projection the PE range
    mask excludes (the mask does NOT catch NaN, so NaN must never reach it)."""
    from petr_tpu.configs.config import DataConfig
    from petr_tpu.data import NuScenesDataset

    infos = make_synth_infos(tmp_path, n=2)
    # corrupt one view's intrinsics with NaN and another's rotation to singular
    infos[0]["cams"]["CAM_FRONT"]["cam_intrinsic"] = np.full((3, 3), np.nan)
    infos[0]["cams"]["CAM_BACK"]["cam_intrinsic"] = np.zeros((3, 3))
    infos[0]["cams"]["CAM_FRONT_LEFT"]["sensor2lidar_rotation"] = np.zeros((3, 3))
    dcfg = DataConfig(image_size=(32, 80), final_dim=(32, 80), max_gt=8)
    ds = NuScenesDataset(infos, dcfg, training=False, src_hw=(90, 160))
    s = ds.get(0)
    assert np.isfinite(s["img2lidar"]).all()
    # corrupt views back-project far outside position_range
    pt = s["img2lidar"][0] @ np.array([10.0, 10.0, 1.0, 1.0])
    assert np.abs(pt[:3]).max() > 1e3
    # healthy views keep a real inverse
    assert np.abs(s["img2lidar"][1] @ np.array([0, 0, 0, 1.0]))[:3].max() < 100


def test_valid_flag_filters_training_gt(tmp_path):
    """use_valid_flag=True (every shipped reference config,
    petr_vovnet_gridmask_p4_800x320.py:210) drops sensor-invisible
    annotations from the training targets; the False fallback uses the
    upstream num_lidar_pts>0 mask."""
    infos = make_synth_infos(tmp_path, n=1)
    info = infos[0]
    # keep boxes well inside PC_RANGE so only the visibility filter acts
    info["gt_boxes"][:, :2] = np.arange(10).reshape(5, 2).astype(float)
    info["valid_flag"] = np.array([True, False, True, False, True])
    info["num_lidar_pts"] = np.array([3, 5, 0, 0, 1])
    info["gt_labels"] = np.arange(5)

    cfg = DataConfig(image_size=(32, 80), final_dim=(32, 80), max_gt=8,
                     bev_rot_range=(0.0, 0.0), bev_scale_range=(1.0, 1.0))
    ds = NuScenesDataset(infos, cfg, training=True, src_hw=(90, 160))
    s = ds.get(0, seed=0)
    assert int(s["gt_valid"].sum()) == 3
    assert sorted(s["gt_labels"][s["gt_valid"]].tolist()) == [0, 2, 4]

    cfg_np = DataConfig(image_size=(32, 80), final_dim=(32, 80), max_gt=8,
                        use_valid_flag=False,
                        bev_rot_range=(0.0, 0.0), bev_scale_range=(1.0, 1.0))
    ds2 = NuScenesDataset(infos, cfg_np, training=True, src_hw=(90, 160))
    s2 = ds2.get(0, seed=0)
    assert sorted(s2["gt_labels"][s2["gt_valid"]].tolist()) == [0, 1, 4]

    # infos without the fields (synthetic fixtures) are untouched
    info.pop("valid_flag"); info.pop("num_lidar_pts")
    s3 = ds2.get(0, seed=0)
    assert int(s3["gt_valid"].sum()) == 5


def test_albu_native_blur_matches_uniform_filter():
    """Box blur = scipy uniform_filter with mirror (reflect-101) borders."""
    from scipy.ndimage import uniform_filter

    from petr_tpu.data.transforms import _box_blur

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (17, 23, 3)).astype(np.float32)
    for k in (3, 5, 7):
        ours = _box_blur(img, k)
        ref = np.stack(
            [uniform_filter(img[..., c], size=k, mode="mirror") for c in range(3)], -1
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_albu_native_ops_and_pipeline():
    from petr_tpu.data.transforms import albu_native

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (32, 40, 3)).astype(np.float32)

    # contrast/brightness stays in range and actually changes the image
    fn = albu_native([{"type": "RandomBrightnessContrast", "p": 1.0}])
    out = fn(img, np.random.default_rng(2))
    assert out.shape == img.shape and out.min() >= 0 and out.max() <= 255
    assert not np.allclose(out, img)

    # cutout zeroes some pixels, touches nothing else
    fn = albu_native([{"type": "CoarseDropout", "max_holes": 4, "p": 1.0,
                       "max_height": 6, "max_width": 6, "fill_value": 0}])
    out = fn(img, np.random.default_rng(3))
    changed = np.any(out != img, axis=-1)
    assert changed.any()
    assert np.all(out[changed] == 0.0)

    # p=0 is identity; unknown type raises at build time
    fn = albu_native([{"type": "Blur", "p": 0.0}])
    np.testing.assert_array_equal(fn(img, np.random.default_rng(4)), img)
    with pytest.raises(ValueError, match="unsupported"):
        albu_native([{"type": "ElasticTransform"}])


def test_albu_native_blur_kernel_within_limit(monkeypatch):
    """Sampled kernels stay odd and within [3, blur_limit] even for an EVEN
    limit (albumentations semantics; an even limit of 8 must never yield 9)."""
    import petr_tpu.data.transforms as T

    seen = []
    monkeypatch.setattr(
        T, "_box_blur", lambda img, k: (seen.append(k), img)[1]
    )
    fn = T.albu_native([{"type": "Blur", "blur_limit": 8, "p": 1.0}])
    img = np.zeros((8, 8, 3), np.float32)
    rng = np.random.default_rng(0)
    for _ in range(200):
        fn(img, rng)
    assert set(seen) == {3, 5, 7}

    with pytest.raises(ValueError, match="blur_limit"):
        T.albu_native([{"type": "Blur", "blur_limit": 2}])


def test_albu_native_through_dataset_view_transform(tmp_path):
    """albu_native plugs into the Dataset's view_transform extension point
    (the reference wires AlbuMultiview3D into the pipeline the same way)."""
    from petr_tpu.configs import get_config
    from petr_tpu.data import NuScenesDataset
    from petr_tpu.data.synthetic import generate_synthetic_scenes
    from petr_tpu.data.transforms import albu_native

    splits = generate_synthetic_scenes(
        str(tmp_path), n_scenes=2, frames_per_scene=1, image_hw=(32, 80),
        n_objects=2, val_scenes=1,
    )
    cfg = get_config("tiny_debug").data
    import dataclasses

    cfg = dataclasses.replace(cfg, src_hw=(32, 80))
    vt = albu_native([{"type": "RandomBrightnessContrast", "p": 1.0}])
    ds = NuScenesDataset(splits["train"], cfg, training=True, src_hw=(32, 80),
                         view_transform=vt)
    base = NuScenesDataset(splits["train"], cfg, training=True, src_hw=(32, 80))
    a, b = ds.get(0, seed=5), base.get(0, seed=5)
    assert a["images"].shape == b["images"].shape
    assert not np.allclose(a["images"], b["images"])


def test_synthetic_every_frame_has_a_real_sweep(tmp_path):
    """Every synthetic keyframe — including each scene's FIRST — carries a
    real previous-frame sweep (warmup frame at t0 - dt), so temporal (v2)
    runs never hit the pad_empty_sweeps exception path (reference
    `loading.py:69-78`), which would teach "identical images -> nonzero
    velocity" on 1/4 of samples. The warmup uses a separate rng stream so
    fidx >= 0 images are unchanged by its existence."""
    import os

    from PIL import Image

    from petr_tpu.data.synthetic import generate_synthetic_scenes

    dt = 0.5
    splits = generate_synthetic_scenes(
        str(tmp_path), n_scenes=2, frames_per_scene=3, image_hw=(32, 80),
        n_objects=3, val_scenes=1, dt=dt,
    )
    for split, infos in splits.items():
        for info in infos:
            sweeps = info["sweeps_cams"]
            assert len(sweeps) == 1, info["token"]
            prev_ts = sweeps[0]["CAM_FRONT"]["timestamp"]
            assert prev_ts == pytest.approx(info["timestamp"] - dt)
            assert os.path.exists(sweeps[0]["CAM_FRONT"]["data_path"])
    # the warmup frame shows the scene at t0 - dt: same rig, objects moved —
    # a genuinely different image from frame 0 (motion evidence, not a copy)
    f0 = np.asarray(Image.open(str(tmp_path / "s1_f0_CAM_FRONT.jpg")), float)
    fm1 = np.asarray(Image.open(str(tmp_path / "s1_fm1_CAM_FRONT.jpg")), float)
    assert f0.shape == fm1.shape
    assert np.abs(f0 - fm1).mean() > 0.5
