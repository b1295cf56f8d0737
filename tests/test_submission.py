"""Submission export: lidar->global conversion must invert the info
builder's global->lidar GT conversion (upstream `lidar_nusc_box_to_global`
equivalence), and the schema/filters must match the official format.
"""

import numpy as np
import pytest

from petr_tpu.data.info import build_infos
from petr_tpu.metrics.nuscenes import DetectionBox, _rot_of as quat_to_rot
from petr_tpu.metrics.submission import (
    _rot_to_quat,
    build_submission,
    format_sample,
    lidar_box_to_global,
    quat_mult,
)
from test_info_builder import fake_db  # noqa: F401  (pytest fixture)


def _quat_close(q1, q2, atol=1e-9):
    q1, q2 = np.asarray(q1, float), np.asarray(q2, float)
    # q and -q are the same rotation
    return abs(abs(np.dot(q1, q2)) - 1.0) < atol


def test_quat_helpers():
    rng = np.random.default_rng(0)
    for _ in range(5):
        q1 = rng.normal(size=4)
        q1 /= np.linalg.norm(q1)
        q2 = rng.normal(size=4)
        q2 /= np.linalg.norm(q2)
        np.testing.assert_allclose(
            quat_to_rot(quat_mult(q1, q2)), quat_to_rot(q1) @ quat_to_rot(q2),
            atol=1e-12,
        )
        # matrix -> quaternion inverse (info records may store 3x3 poses)
        assert _quat_close(_rot_to_quat(quat_to_rot(q1)), q1, atol=1e-9)


def test_roundtrip_global_lidar_global(fake_db):  # noqa: F811
    """The info builder converts the annotation global->lidar; the submission
    path must convert it back to the ORIGINAL global pose/velocity."""
    infos = build_infos(
        "", "v1.0-trainval", nusc=fake_db,
        train_scenes=["scene-0001"], val_scenes=["scene-0002"],
    )
    info = infos["train"][0]
    # pose stored (nuscenes_converter.py:184-185 behavior)
    np.testing.assert_allclose(info["ego2global_translation"], [100.0, 50.0, 0.0])
    assert info["ego2global_rotation"].shape == (4,)

    box = info["gt_boxes"][0]  # lidar frame, bottom-center z, mmdet yaw
    center = np.array([box[0], box[1], box[2] + box[5] / 2.0])
    c_g, q_g, v_g, ego_r = lidar_box_to_global(
        info, center, float(box[6]), info["gt_velocity"][0]
    )

    # the fixture's original annotation (see test_info_builder.fake_db)
    ann = fake_db.tables["sample_annotation"]["ann1"]
    np.testing.assert_allclose(c_g, ann["translation"], atol=1e-9)
    assert _quat_close(q_g, ann["rotation"])
    np.testing.assert_allclose(v_g, [2.0, 0.0], atol=1e-9)
    # ego radius: lidar-frame box at [10, 5, 1], lidar mount [1, 0, 2]
    # -> ego frame [11, 5, ...]
    assert ego_r == pytest.approx(np.hypot(11.0, 5.0), abs=1e-9)


def test_format_sample_range_filter_and_schema(fake_db):  # noqa: F811
    infos = build_infos(
        "", "v1.0-trainval", nusc=fake_db,
        train_scenes=["scene-0001"], val_scenes=["scene-0002"],
    )
    info = infos["train"][0]

    def det(center, name="car"):
        return DetectionBox(
            sample_token=info["token"], center=np.asarray(center, float),
            size=np.array([2.0, 4.5, 1.6]), yaw=0.3,
            velocity=np.array([1.0, 0.0]), name=name, score=0.9,
            attr="vehicle.moving",
        )

    near, far = det([10.0, 5.0, 1.0]), det([70.0, 0.0, 1.0])
    rows = format_sample(info, [near, far])
    assert len(rows) == 1  # 70 m car is beyond the 50 m eval range
    r = rows[0]
    assert set(r) == {
        "sample_token", "translation", "size", "rotation", "velocity",
        "detection_name", "detection_score", "attribute_name",
    }
    assert len(r["translation"]) == 3 and len(r["rotation"]) == 4
    assert len(r["velocity"]) == 2 and r["size"] == [2.0, 4.5, 1.6]
    assert abs(np.linalg.norm(r["rotation"]) - 1.0) < 1e-9

    sub = build_submission({info["token"]: [near]}, [info])
    assert sub["meta"]["use_camera"] and not sub["meta"]["use_lidar"]
    assert list(sub["results"]) == [info["token"]]


def test_build_submission_rejects_legacy_infos(fake_db):  # noqa: F811
    infos = build_infos(
        "", "v1.0-trainval", nusc=fake_db,
        train_scenes=["scene-0001"], val_scenes=["scene-0002"],
    )
    info = dict(infos["train"][0])
    info.pop("ego2global_rotation")
    d = DetectionBox(
        sample_token=info["token"], center=np.zeros(3), size=np.ones(3),
        yaw=0.0, velocity=np.zeros(2), name="car", score=0.5,
    )
    with pytest.raises(ValueError, match="ego2global"):
        build_submission({info["token"]: [d]}, [info])
