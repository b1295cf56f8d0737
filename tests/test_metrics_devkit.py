"""Cross-validation of `petr_tpu/metrics/nuscenes.py` against the ACTUAL
nuscenes-devkit algorithm (pip package; needs no dataset).

Skipped when the devkit is not installed (this container ships without it).
When available, identical synthetic GT/pred sets flow through BOTH
evaluators — devkit `accumulate`/`calc_ap`/`calc_tp` vs our re-implementation
— and the mAP/NDS/TP-error outputs must agree to float precision, including
the adversarial corners: classes with no GT anywhere, all-NaN attribute
errors, >500 predictions per sample, and boundary recalls.
"""

import numpy as np
import pytest

nuscenes = pytest.importorskip("nuscenes")

from nuscenes.eval.common.data_classes import EvalBoxes  # noqa: E402
from nuscenes.eval.detection.algo import accumulate, calc_ap, calc_tp  # noqa: E402
from nuscenes.eval.detection.data_classes import (  # noqa: E402
    DetectionBox as DevkitBox,
    DetectionConfig,
    DetectionMetricDataList,
    DetectionMetrics,
)

from petr_tpu.metrics.nuscenes import (  # noqa: E402
    DIST_THRESHOLDS,
    TP_DIST,
    DetectionBox,
    evaluate_detections,
)

CLASSES = ("car", "pedestrian", "bicycle", "traffic_cone", "barrier")
TP_NAMES = ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err")
ATTRS = ("", "vehicle.moving", "vehicle.parked", "pedestrian.moving",
         "cycle.with_rider")


def _gen_boxes(rng, token, n, is_gt):
    ours, theirs = [], []
    for _ in range(n):
        name = CLASSES[int(rng.integers(len(CLASSES)))]
        center = np.array([rng.uniform(-45, 45), rng.uniform(-45, 45),
                           rng.uniform(-1, 2)])
        size = rng.uniform(0.5, 4.0, 3)
        yaw = float(rng.uniform(-np.pi, np.pi))
        vel = rng.normal(0, 3, 2)
        attr = ATTRS[int(rng.integers(len(ATTRS)))]
        score = float(rng.uniform(0, 1)) if not is_gt else -1.0
        # devkit filter_eval_boxes uses ego_translation; keep ego == lidar
        ours.append(DetectionBox(
            sample_token=token, center=center, size=size, yaw=yaw,
            velocity=vel, name=name, score=score, attr=attr,
            num_pts=10 if is_gt else -1,
            ego_dist=float(np.hypot(center[0], center[1])),
        ))
        theirs.append(DevkitBox(
            sample_token=token, translation=tuple(center), size=tuple(size),
            rotation=(float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))),
            velocity=tuple(vel), detection_name=name,
            detection_score=score if not is_gt else -1.0,
            attribute_name=attr, ego_translation=tuple(center), num_pts=10,
        ))
    return ours, theirs


def _devkit_eval(gt_eb, pred_eb, classes):
    cfg = DetectionConfig(
        class_range={c: 50.0 if c in ("car",) else 40.0 if c in
                     ("pedestrian", "bicycle") else 30.0 for c in classes},
        dist_fcn="center_distance", dist_ths=list(DIST_THRESHOLDS),
        dist_th_tp=TP_DIST, min_recall=0.1, min_precision=0.1,
        max_boxes_per_sample=500, mean_ap_weight=5,
    )
    from nuscenes.eval.common.loaders import filter_eval_boxes  # needs nusc
    # no dataset: filter manually by ego_dist (identical formula)
    for eb in (gt_eb, pred_eb):
        for tok in eb.sample_tokens:
            eb.boxes[tok] = [b for b in eb.boxes[tok]
                             if b.ego_dist <= cfg.class_range[b.detection_name]]

    metrics = DetectionMetrics(cfg)
    mdl = DetectionMetricDataList()
    for cls in classes:
        for th in cfg.dist_ths:
            mdl.set(cls, th, accumulate(gt_eb, pred_eb, cls, "center_distance", th))
    for cls in classes:
        for th in cfg.dist_ths:
            metrics.add_label_ap(cls, th, calc_ap(mdl[(cls, th)],
                                                  cfg.min_recall, cfg.min_precision))
        for tp_name in TP_NAMES:
            from nuscenes.eval.detection.constants import TP_METRICS
            if tp_name not in TP_METRICS:
                continue
            metrics.add_label_tp(cls, tp_name,
                                 calc_tp(mdl[(cls, cfg.dist_th_tp)],
                                         cfg.min_recall, tp_name))
    return metrics


@pytest.mark.parametrize("seed,n_gt,n_pred", [(0, 6, 20), (1, 0, 10), (2, 4, 600)])
def test_metrics_match_devkit(seed, n_gt, n_pred):
    rng = np.random.default_rng(seed)
    gts, preds = {}, {}
    gt_eb, pred_eb = EvalBoxes(), EvalBoxes()
    for tok in ("t0", "t1", "t2"):
        og, tg = _gen_boxes(rng, tok, n_gt, is_gt=True)
        op, tp = _gen_boxes(rng, tok, n_pred, is_gt=False)
        gts[tok], preds[tok] = og, op
        gt_eb.add_boxes(tok, tg)
        pred_eb.add_boxes(tok, tp)

    ours = evaluate_detections(gts, preds, classes=CLASSES)
    theirs = _devkit_eval(gt_eb, pred_eb, CLASSES)

    dev_map = theirs.mean_ap
    assert ours["mAP"] == pytest.approx(dev_map, abs=1e-9)
    for short, name in (("mATE", "trans_err"), ("mASE", "scale_err"),
                        ("mAOE", "orient_err"), ("mAVE", "vel_err"),
                        ("mAAE", "attr_err")):
        assert ours[short] == pytest.approx(
            theirs.tp_errors[name], abs=1e-9), name
    assert ours["NDS"] == pytest.approx(theirs.nd_score, abs=1e-9)
