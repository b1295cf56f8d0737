from petr_tpu.metrics.nuscenes import evaluate_detections, DetectionBox
