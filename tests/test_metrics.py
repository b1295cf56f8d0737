"""nuScenes metric implementation sanity checks."""

import numpy as np
import pytest

from petr_tpu.metrics.nuscenes import (
    DetectionBox,
    boxes_from_arrays,
    evaluate_detections,
)


def box(tok, x, y, name="car", score=-1.0, yaw=0.0, vel=(0, 0), size=(2, 4, 1.5),
        attr="vehicle.parked", num_pts=10):
    return DetectionBox(
        sample_token=tok,
        center=np.array([x, y, 0.0]),
        size=np.array(size, float),
        yaw=yaw,
        velocity=np.array(vel, float),
        name=name,
        score=score,
        attr=attr,
        num_pts=num_pts,
    )


def test_perfect_detections_give_map1_nds1():
    gts, preds = {}, {}
    rng = np.random.RandomState(0)
    for s in range(4):
        tok = f"s{s}"
        gts[tok] = [box(tok, *rng.uniform(-30, 30, 2), yaw=0.3, vel=(1, 0)) for _ in range(5)]
        preds[tok] = [
            box(tok, g.center[0], g.center[1], score=0.9, yaw=0.3, vel=(1, 0),
                attr="vehicle.parked")
            for g in gts[tok]
        ]
    res = evaluate_detections(gts, preds)
    assert res["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert res["NDS"] == pytest.approx(1.0, abs=1e-6)
    assert res["mATE"] == pytest.approx(0.0, abs=1e-6)


def test_no_predictions_zero():
    gts = {"s0": [box("s0", 1, 1)]}
    preds = {"s0": []}
    res = evaluate_detections(gts, preds)
    assert res["mAP"] == 0.0
    assert res["NDS"] <= 0.5


def test_translation_threshold_sensitivity():
    """Offset 1.5 m: TP at d=2,4 but FP at d=0.5,1 -> AP ~ 0.5."""
    gts, preds = {}, {}
    for s in range(10):
        tok = f"s{s}"
        gts[tok] = [box(tok, 3.0 * s, 0.0)]
        preds[tok] = [box(tok, 3.0 * s + 1.5, 0.0, score=0.9)]
    res = evaluate_detections(gts, preds)
    assert 0.4 < res["mAP"] < 0.6
    assert res["mATE"] == pytest.approx(1.5, abs=0.05)


def test_wrong_class_is_fp():
    gts = {"s0": [box("s0", 0, 0, name="car")]}
    preds = {"s0": [box("s0", 0, 0, name="truck", score=0.9)]}
    res = evaluate_detections(gts, preds)
    assert res["AP_car"] == 0.0


def test_range_filtering():
    # pedestrian at 45 m is outside its 40 m eval range: excluded from GT
    gts = {"s0": [box("s0", 45, 0, name="pedestrian"), box("s0", 10, 0, name="pedestrian")]}
    preds = {"s0": [box("s0", 10, 0, name="pedestrian", score=0.9)]}
    res = evaluate_detections(gts, preds)
    assert res["AP_pedestrian"] == pytest.approx(1.0, abs=1e-6)


def test_orientation_error():
    gts = {"s0": [box("s0", 0, 0, yaw=0.0)] * 1}
    preds = {"s0": [box("s0", 0, 0, yaw=0.5, score=0.9)]}
    res = evaluate_detections(gts, preds)
    assert res["mAOE"] == pytest.approx(0.5, abs=1e-3)


def test_barrier_yaw_period_pi():
    gts = {"s0": [box("s0", 0, 0, name="barrier", yaw=0.0)]}
    preds = {"s0": [box("s0", 0, 0, name="barrier", yaw=np.pi - 0.1, score=0.9)]}
    res = evaluate_detections(gts, preds)
    # with period pi, error is 0.1, not pi-0.1
    assert res["mAOE"] == pytest.approx(0.1, abs=1e-3)


def test_boxes_from_arrays_attribute_heuristic():
    boxes = np.zeros((2, 9), np.float32)
    boxes[:, 3:6] = 1
    boxes[0, 7] = 3.0  # moving car
    dets = boxes_from_arrays(
        "t", boxes, np.array([0.9, 0.8]), np.array([0, 8]), np.ones(2, bool)
    )
    assert dets[0].attr == "vehicle.moving"
    assert dets[1].name == "pedestrian" and dets[1].attr == "pedestrian.moving"
