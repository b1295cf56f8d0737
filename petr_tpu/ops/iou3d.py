"""Rotated BEV / 3D IoU (host-side NumPy).

Capability parity with the reference's `core/bbox/iou_calculators/iou3d_calculator.py`
(which delegates to mmdet3d CUDA rotated-overlap kernels). PETR's hot path is
NMS-free with IoU cost weight 0, so this is eval/analysis tooling only —
implemented as exact polygon clipping (Sutherland-Hodgman) on the host.
Boxes: (cx, cy, cz, w, l, h, yaw) with gravity-center z.
"""

from __future__ import annotations

import numpy as np


def _bev_corners(box: np.ndarray) -> np.ndarray:
    cx, cy, w, l, yaw = box[0], box[1], box[3], box[4], box[6]
    c, s = np.cos(yaw), np.sin(yaw)
    local = np.array(
        [[-w / 2, -l / 2], [w / 2, -l / 2], [w / 2, l / 2], [-w / 2, l / 2]]
    )
    R = np.array([[c, -s], [s, c]])
    return local @ R.T + np.array([cx, cy])


def _clip_polygon(poly: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Clip polygon by the half-plane left of edge a->b."""
    if len(poly) == 0:
        return poly
    d = b - a
    out = []
    n = len(poly)
    for i in range(n):
        p, q = poly[i], poly[(i + 1) % n]
        side_p = d[0] * (p[1] - a[1]) - d[1] * (p[0] - a[0])
        side_q = d[0] * (q[1] - a[1]) - d[1] * (q[0] - a[0])
        if side_p >= 0:
            out.append(p)
        if (side_p > 0) != (side_q > 0) and side_p != side_q:
            t = side_p / (side_p - side_q)
            out.append(p + t * (q - p))
    return np.asarray(out) if out else np.zeros((0, 2))


def _poly_area(poly: np.ndarray) -> float:
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def bev_overlap(box_a: np.ndarray, box_b: np.ndarray) -> float:
    """Exact rotated-rectangle intersection area in BEV."""
    pa = _bev_corners(np.asarray(box_a, float))
    pb = _bev_corners(np.asarray(box_b, float))
    poly = pa
    for i in range(4):
        poly = _clip_polygon(poly, pb[i], pb[(i + 1) % 4])
    return _poly_area(poly)


def bev_iou(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """(Na, Nb) rotated IoU in BEV."""
    boxes_a = np.asarray(boxes_a, float).reshape(-1, boxes_a.shape[-1])
    boxes_b = np.asarray(boxes_b, float).reshape(-1, boxes_b.shape[-1])
    out = np.zeros((len(boxes_a), len(boxes_b)))
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    for i, a in enumerate(boxes_a):
        for j, b in enumerate(boxes_b):
            inter = bev_overlap(a, b)
            union = area_a[i] + area_b[j] - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def iou_3d(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """(Na, Nb) full 3D IoU (BEV overlap x z-overlap)."""
    boxes_a = np.asarray(boxes_a, float).reshape(-1, boxes_a.shape[-1])
    boxes_b = np.asarray(boxes_b, float).reshape(-1, boxes_b.shape[-1])
    out = np.zeros((len(boxes_a), len(boxes_b)))
    for i, a in enumerate(boxes_a):
        for j, b in enumerate(boxes_b):
            inter_bev = bev_overlap(a, b)
            za0, za1 = a[2] - a[5] / 2, a[2] + a[5] / 2
            zb0, zb1 = b[2] - b[5] / 2, b[2] + b[5] / 2
            dz = max(0.0, min(za1, zb1) - max(za0, zb0))
            inter = inter_bev * dz
            vol_a = a[3] * a[4] * a[5]
            vol_b = b[3] * b[4] * b[5]
            union = vol_a + vol_b - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def nms_bev(
    boxes: np.ndarray, scores: np.ndarray, iou_thr: float = 0.5, max_out: int = 500
) -> np.ndarray:
    """Greedy rotated-BEV NMS; returns kept indices (analysis tooling —
    PETR decoding is NMS-free)."""
    order = np.argsort(-np.asarray(scores))
    keep = []
    for idx in order:
        ok = True
        for k in keep:
            if bev_iou(boxes[idx : idx + 1], boxes[k : k + 1])[0, 0] > iou_thr:
                ok = False
                break
        if ok:
            keep.append(int(idx))
            if len(keep) >= max_out:
                break
    return np.asarray(keep, np.int64)
