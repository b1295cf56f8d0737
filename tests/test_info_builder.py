"""Unit test for the nuScenes info builder (`petr_tpu/data/info.py`).

Drives `build_infos` through a fake in-memory devkit object so the data-prep
path (reference `tools/data_converter/nuscenes_converter.py:26-340`) is
exercised without the devkit or raw data: sensor->lidar transform chains,
GT global->lidar conversion incl. the mmdet3d yaw convention, velocity
rotation, splits routing, sweep chaining, and the lidar2ego calibration the
metric evaluator's range filter consumes.
"""

import numpy as np
import pytest

from petr_tpu.data.info import CAM_NAMES, build_infos

SQ2 = np.sqrt(2.0) / 2.0
QUAT_Z90 = (SQ2, 0.0, 0.0, SQ2)  # 90 deg about z, (w, x, y, z)
QUAT_ID = (1.0, 0.0, 0.0, 0.0)


def rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


class FakeNusc:
    """Minimal stand-in for the devkit surface build_infos touches."""

    def __init__(self):
        self.tables = {
            "calibrated_sensor": {},
            "ego_pose": {},
            "sample_data": {},
            "sample_annotation": {},
            "attribute": {},
        }
        self.sample = []
        self.scene = []
        self._velocity = {}

    def get(self, table, token):
        return self.tables[table][token]

    def box_velocity(self, ann_token):
        return self._velocity[ann_token]


@pytest.fixture
def fake_db():
    n = FakeNusc()
    n.scene = [{"token": "sc1", "name": "scene-0001"},
               {"token": "sc2", "name": "scene-0002"}]

    # calibrations: lidar mounted at [1, 0, 2] (identity rotation); camera
    # at [0.5, 0, 1.5]
    n.tables["calibrated_sensor"]["cs_lidar"] = {
        "translation": [1.0, 0.0, 2.0], "rotation": QUAT_ID}
    n.tables["calibrated_sensor"]["cs_cam"] = {
        "translation": [0.5, 0.0, 1.5], "rotation": QUAT_ID,
        "camera_intrinsic": (np.eye(3) * 500.0).tolist()}
    # ego pose: yaw 90 deg at [100, 50, 0]
    n.tables["ego_pose"]["ep0"] = {"translation": [100.0, 50.0, 0.0],
                                   "rotation": QUAT_Z90}

    n.tables["sample_data"]["sd_lidar"] = {
        "filename": "lidar.bin", "timestamp": 1_000_000,
        "calibrated_sensor_token": "cs_lidar", "ego_pose_token": "ep0",
        "sensor_modality": "lidar", "prev": ""}
    for cam in CAM_NAMES:
        n.tables["sample_data"][f"sd_{cam}"] = {
            "filename": f"{cam}.jpg", "timestamp": 1_000_000,
            "calibrated_sensor_token": "cs_cam", "ego_pose_token": "ep0",
            "sensor_modality": "camera", "prev": f"sd_{cam}_p1"}
        # exactly one previous frame (same pose -> same transform), then end
        n.tables["sample_data"][f"sd_{cam}_p1"] = {
            "filename": f"{cam}_p1.jpg", "timestamp": 500_000,
            "calibrated_sensor_token": "cs_cam", "ego_pose_token": "ep0",
            "sensor_modality": "camera", "prev": ""}

    # one car: lidar-frame center should come out at [10, 5, 1]
    R_le, t_le = rotz(np.pi / 2), np.array([100.0, 50.0, 0.0])
    t_l = np.array([1.0, 0.0, 2.0])
    p_l = np.array([10.0, 5.0, 1.0])
    p_g = R_le @ (p_l + t_l) + t_le
    yaw_g = np.pi / 3  # global box yaw
    qb = (np.cos(yaw_g / 2), 0.0, 0.0, np.sin(yaw_g / 2))
    n.tables["sample_annotation"]["ann1"] = {
        "category_name": "vehicle.car", "translation": p_g.tolist(),
        "rotation": qb, "size": [2.0, 4.5, 1.6],  # (w, l, h)
        "num_lidar_pts": 7, "num_radar_pts": 2,
        "attribute_tokens": ["attr_parked"]}
    n.tables["attribute"]["attr_parked"] = {"name": "vehicle.parked"}
    n._velocity["ann1"] = np.array([2.0, 0.0, 0.0])  # global frame

    # an annotation of an unmapped category must be dropped
    n.tables["sample_annotation"]["ann2"] = {
        "category_name": "static_object.bicycle_rack", "translation": [0, 0, 0],
        "rotation": QUAT_ID, "size": [1, 1, 1],
        "num_lidar_pts": 1, "num_radar_pts": 0, "attribute_tokens": []}
    n._velocity["ann2"] = np.array([0.0, 0.0, 0.0])

    n.sample = [{
        "token": "smp1", "scene_token": "sc1", "timestamp": 1_000_000,
        "data": {"LIDAR_TOP": "sd_lidar",
                 **{c: f"sd_{c}" for c in CAM_NAMES}},
        "anns": ["ann1", "ann2"],
    }]
    return n


def test_build_infos_fake_db(fake_db):
    infos = build_infos(
        "", "v1.0-trainval", max_prev_frames=30, nusc=fake_db,
        train_scenes=["scene-0001"], val_scenes=["scene-0002"],
    )
    assert len(infos["train"]) == 1 and infos["val"] == []
    info = infos["train"][0]
    assert info["token"] == "smp1" and info["scene_token"] == "sc1"

    # lidar->ego calibration recorded for the evaluator's ego-dist filter
    np.testing.assert_allclose(info["lidar2ego_translation"], [1.0, 0.0, 2.0])

    # camera chain: same-timestamp ego pose cancels -> sensor2lidar is the
    # mount offset cam - lidar, identity rotation
    assert set(info["cams"]) == set(CAM_NAMES)
    cam = info["cams"]["CAM_FRONT"]
    np.testing.assert_allclose(
        cam["sensor2lidar_translation"], [-0.5, 0.0, -0.5], atol=1e-12)
    np.testing.assert_allclose(cam["sensor2lidar_rotation"], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(cam["cam_intrinsic"], np.eye(3) * 500.0)
    assert cam["data_path"] == "CAM_FRONT.jpg"

    # one sweep frame with identical (same-pose) transforms
    assert len(info["sweeps_cams"]) == 1
    sw = info["sweeps_cams"][0]["CAM_FRONT"]
    np.testing.assert_allclose(
        sw["sensor2lidar_translation"], cam["sensor2lidar_translation"], atol=1e-12)
    assert sw["data_path"] == "CAM_FRONT_p1.jpg"
    assert sw["timestamp"] == pytest.approx(0.5)

    # GT: unmapped category dropped; car converted to the lidar frame
    assert info["gt_boxes"].shape == (1, 7)
    box = info["gt_boxes"][0]
    np.testing.assert_allclose(box[:3], [10.0, 5.0, 1.0 - 0.8], atol=1e-9)
    np.testing.assert_allclose(box[3:6], [2.0, 4.5, 1.6])
    # lidar-frame yaw = yaw_g - pi/2 (ego yaw), stored as -yaw - pi/2
    expected = -(np.pi / 3 - np.pi / 2) - np.pi / 2
    assert (box[6] - expected) % (2 * np.pi) == pytest.approx(0.0, abs=1e-9)

    # velocity rotated global->lidar: R(-90deg) @ [2, 0] = [0, -2]
    np.testing.assert_allclose(info["gt_velocity"][0], [0.0, -2.0], atol=1e-9)
    assert info["gt_labels"][0] == 0  # car
    # num_lidar_pts is lidar-only (upstream field); num_pts is lidar+radar
    # (devkit GT filter)
    assert info["valid_flag"][0]
    assert info["num_lidar_pts"][0] == 7 and info["num_pts"][0] == 9
    assert info["gt_attrs"] == ["vehicle.parked"]


def test_build_infos_val_split(fake_db):
    fake_db.sample[0]["scene_token"] = "sc2"
    infos = build_infos(
        "", "v1.0-trainval", nusc=fake_db,
        train_scenes=["scene-0001"], val_scenes=["scene-0002"],
    )
    assert infos["train"] == [] and len(infos["val"]) == 1
