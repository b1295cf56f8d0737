"""nuScenes metric implementation sanity + devkit-conformance checks.

The evaluator follows the official devkit algorithm exactly, including its
treatment of classes with no GT (scored as AP 0 / TP errors 1 and INCLUDED
in the means — `DetectionMetricData.no_predictions()`), so synthetic tests
pass a restricted ``classes`` tuple covering only the classes present.
"""

import numpy as np
import pytest

from petr_tpu.metrics.nuscenes import (
    DetectionBox,
    boxes_from_arrays,
    evaluate_detections,
    _cummean,
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
    res = evaluate_detections(gts, preds, classes=("car",))
    assert res["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert res["NDS"] == pytest.approx(1.0, abs=1e-6)
    assert res["mATE"] == pytest.approx(0.0, abs=1e-6)


def test_absent_classes_penalize_like_devkit():
    """devkit: a config class with no GT anywhere contributes AP 0 and TP
    errors 1.0 to the means (no_predictions), it is not skipped."""
    gts = {"s0": [box("s0", 1, 1)]}
    preds = {"s0": [box("s0", 1, 1, score=0.9)]}
    one = evaluate_detections(gts, preds, classes=("car",))
    two = evaluate_detections(gts, preds, classes=("car", "truck"))
    assert one["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert two["mAP"] == pytest.approx(0.5, abs=1e-6)
    assert two["AP_truck"] == 0.0
    # car mATE 0 and truck mATE 1 average to 0.5
    assert two["mATE"] == pytest.approx(0.5, abs=1e-6)


def test_no_predictions_zero():
    gts = {"s0": [box("s0", 1, 1)]}
    preds = {"s0": []}
    res = evaluate_detections(gts, preds, classes=("car",))
    assert res["mAP"] == 0.0
    assert res["NDS"] <= 0.5


def test_translation_threshold_sensitivity():
    """Offset 1.5 m: TP at d=2,4 but FP at d=0.5,1 -> AP ~ 0.5."""
    gts, preds = {}, {}
    for s in range(10):
        tok = f"s{s}"
        gts[tok] = [box(tok, 3.0 * s, 0.0)]
        preds[tok] = [box(tok, 3.0 * s + 1.5, 0.0, score=0.9)]
    res = evaluate_detections(gts, preds, classes=("car",))
    assert 0.4 < res["mAP"] < 0.6
    assert res["mATE"] == pytest.approx(1.5, abs=0.05)


def test_wrong_class_is_fp():
    gts = {"s0": [box("s0", 0, 0, name="car")]}
    preds = {"s0": [box("s0", 0, 0, name="truck", score=0.9)]}
    res = evaluate_detections(gts, preds, classes=("car",))
    assert res["AP_car"] == 0.0


def test_range_filtering():
    # pedestrian at 45 m is outside its 40 m eval range: excluded from GT
    gts = {"s0": [box("s0", 45, 0, name="pedestrian"), box("s0", 10, 0, name="pedestrian")]}
    preds = {"s0": [box("s0", 10, 0, name="pedestrian", score=0.9)]}
    res = evaluate_detections(gts, preds, classes=("pedestrian",))
    assert res["AP_pedestrian"] == pytest.approx(1.0, abs=1e-6)


def test_range_filtering_uses_ego_dist_when_set():
    """devkit filters on distance from the EGO origin, not the lidar origin:
    a pedestrian at lidar-frame 41 m but ego_dist 39 m stays in range."""
    g = box("s0", 41, 0, name="pedestrian")
    g.ego_dist = 39.0
    p = box("s0", 41, 0, name="pedestrian", score=0.9)
    p.ego_dist = 39.0
    res = evaluate_detections({"s0": [g]}, {"s0": [p]}, classes=("pedestrian",))
    assert res["AP_pedestrian"] == pytest.approx(1.0, abs=1e-6)
    # and the reverse: ego_dist out of range drops it even if lidar-frame is in
    g2 = box("s0", 39, 0, name="pedestrian")
    g2.ego_dist = 41.0
    res2 = evaluate_detections({"s0": [g2]}, {"s0": []}, classes=("pedestrian",))
    # no GT left -> no_predictions -> AP 0 with TP errors 1
    assert res2["AP_pedestrian"] == 0.0 and res2["mATE"] == 1.0


def test_orientation_error():
    gts = {"s0": [box("s0", 0, 0, yaw=0.0)] * 1}
    preds = {"s0": [box("s0", 0, 0, yaw=0.5, score=0.9)]}
    res = evaluate_detections(gts, preds, classes=("car",))
    assert res["mAOE"] == pytest.approx(0.5, abs=1e-3)


def test_barrier_yaw_period_pi():
    gts = {"s0": [box("s0", 0, 0, name="barrier", yaw=0.0)]}
    preds = {"s0": [box("s0", 0, 0, name="barrier", yaw=np.pi - 0.1, score=0.9)]}
    res = evaluate_detections(gts, preds, classes=("barrier",))
    # with period pi, error is 0.1, not pi-0.1
    assert res["mAOE"] == pytest.approx(0.1, abs=1e-3)


def test_cummean_all_nan_is_worst_case():
    """devkit cummean: an all-NaN series returns ones (worst), not zeros."""
    assert np.all(_cummean(np.array([np.nan, np.nan])) == 1.0)
    # mixed NaN: running mean over the non-NaN entries
    out = _cummean(np.array([np.nan, 1.0, 3.0]))
    assert out[1] == pytest.approx(1.0) and out[2] == pytest.approx(2.0)


def test_all_unattributed_gts_make_aae_worst():
    """every matched GT lacks an attribute -> attr_err column is all-NaN ->
    devkit scores mAAE 1.0."""
    gts = {"s0": [box("s0", 0, 0, attr="")]}
    preds = {"s0": [box("s0", 0, 0, score=0.9, attr="vehicle.parked")]}
    res = evaluate_detections(gts, preds, classes=("car",))
    assert res["mAAE"] == pytest.approx(1.0, abs=1e-6)
    assert res["mATE"] == pytest.approx(0.0, abs=1e-6)  # matching still fine


def test_boxes_from_arrays_attribute_heuristic():
    boxes = np.zeros((2, 9), np.float32)
    boxes[:, 3:6] = 1
    boxes[0, 7] = 3.0  # moving car
    dets = boxes_from_arrays(
        "t", boxes, np.array([0.9, 0.8]), np.array([0, 8]), np.ones(2, bool)
    )
    assert dets[0].attr == "vehicle.moving"
    assert dets[1].name == "pedestrian" and dets[1].attr == "pedestrian.moving"


def test_boxes_from_arrays_ego_dist_from_info():
    boxes = np.zeros((1, 9), np.float32)
    boxes[0, :3] = [10.0, 0.0, 0.0]
    boxes[0, 3:6] = 1
    info = {
        "lidar2ego_translation": np.array([1.0, 0.0, 1.8]),
        "lidar2ego_rotation": np.array([1.0, 0.0, 0.0, 0.0]),  # identity quat
    }
    dets = boxes_from_arrays(
        "t", boxes, np.array([0.9]), np.array([0]), np.ones(1, bool), info=info
    )
    assert dets[0].ego_dist == pytest.approx(11.0, abs=1e-9)
    # without info: unknown
    dets2 = boxes_from_arrays(
        "t", boxes, np.array([0.9]), np.array([0]), np.ones(1, bool)
    )
    assert dets2[0].ego_dist == -1.0


def test_bike_rack_filter_bias_bound():
    """Quantify the missing devkit bikes-in-rack GT removal (needs the map
    layer; `metrics/nuscenes.py` docstring). Construct bicycle GT where a
    fraction f sits in racks and the detector misses exactly those; devkit
    semantics REMOVE them (GT and rack-area preds) before scoring. Measured
    worst-case bias on AP_bicycle is bounded by the rack fraction — with the
    measured numbers recorded in PARITY.md."""
    from petr_tpu.metrics.nuscenes import DetectionBox, evaluate_detections

    def make(n_total, n_rack, seed=0):
        rng = np.random.default_rng(seed)
        gts, preds = [], []
        for i in range(n_total):
            c = np.array([rng.uniform(-25, 25), rng.uniform(-25, 25), 0.0])
            in_rack = i < n_rack
            gts.append((DetectionBox("t", c, np.array([0.6, 1.8, 1.2]), 0.0,
                                     np.zeros(2), "bicycle", num_pts=10), in_rack))
            if not in_rack:  # detector misses rack bikes (the worst case)
                preds.append(DetectionBox("t", c + rng.normal(0, 0.2, 3),
                                          np.array([0.6, 1.8, 1.2]), 0.0,
                                          np.zeros(2), "bicycle",
                                          score=rng.uniform(0.5, 1.0)))
        return gts, preds

    deltas = {}
    for frac in (0.1, 0.25, 0.5):
        n_total = 20
        n_rack = int(frac * n_total)
        gts, preds = make(n_total, n_rack)
        ours = evaluate_detections(
            {"t": [g for g, _ in gts]}, {"t": preds}, classes=("bicycle",))
        devkit_like = evaluate_detections(
            {"t": [g for g, in_rack in gts if not in_rack]}, {"t": preds},
            classes=("bicycle",))
        delta = devkit_like["AP_bicycle"] - ours["AP_bicycle"]
        deltas[frac] = delta
        assert 0.0 <= delta <= frac / 0.9 + 0.05, (frac, delta)
        assert delta == pytest.approx(frac / 0.9, abs=0.02), (frac, delta)
    # the worst-case bias grows with the rack fraction; nuScenes val has
    # ~1-2% of bicycle GT in racks -> expected bias well under 1 AP point
    assert deltas[0.5] > deltas[0.1]
