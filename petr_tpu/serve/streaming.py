"""Streaming PETRv2 inference with temporal feature caching.

The reference's PETRv2 path re-runs the backbone on all 12 camera images
every sample — the 6 current views plus the 6 previous-frame views selected
by the sweep loader (`models/detectors/petr3d.py:84-85`,
`datasets/pipelines/loading.py:45-118`). That is the right thing for offline
eval with randomized sweep selection, but in a streaming deployment the
previous frame's backbone features were already computed one step ago.

``StreamingPETRv2`` exploits that: per frame it runs backbone+neck on the 6
NEW views only and concatenates the cached previous-frame features for the
other 6. This is exact, not an approximation — backbone features depend only
on pixels, while all ego-motion dependence (the current-frame-aligned
``img2lidar`` matrices and lidar-relative timestamps) enters through the 3D
position embedding inside the head, which is recomputed every frame. The
result equals the full 12-view forward whenever the deployment's previous
frame matches the sweep the offline loader would have picked.

First frame of a scene: call ``prime()`` with the stored sweep's views
(`streaming_sample` returns them as ``prev_images``) so the result matches
the full eval exactly; without any sweep record, features are self-padded
(prev := current), mirroring the reference's ``pad_empty_sweeps``
degradation (`loading.py:69-78`) — then the caller should offset the
previous-frame timestamps the same way the data layer does
(`petr_tpu/data/dataset.py::_select_cams`).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from petr_tpu.configs.config import ExperimentConfig
from petr_tpu.models.detector import PETRFeatureNet, PETRHeadNet
from petr_tpu.ops.nms_free import nms_free_decode


class StreamingPETRv2:
    """Stateful per-frame runner for a 2-frame (12-camera) PETRv2 config.

    Parameters
    ----------
    cfg: the full experiment config (a ``petrv2_*`` preset).
    params: full ``PETRDetector`` param tree (both slices read from it).
    decode: when True, ``step`` returns decoded boxes
        (``boxes/scores/labels/valid``, as ``cli/test.py``); when False, the
        raw per-layer head outputs.
    quant_scales: optional "quant" collection (petr_tpu.quant) enabling the
        int8 PTQ backbone for the per-frame feature extraction; the config's
        backbone quant mode is switched to "int8" automatically.

    Per-frame inputs to ``step``:
      images:    (B, 6, H, W, 3) — the CURRENT frame's normalized views only.
      img2lidar: (B, 12, 4, 4)  — current 6 first, previous 6 after, both
                 expressed in the CURRENT frame's lidar coordinates (the same
                 ego-aligned convention the 30-frame info files use).
      img_hw:    (B, 12, 2)
      timestamp: (B, 12) lidar-relative deltas (required for with_time).
    """

    def __init__(
        self, cfg: ExperimentConfig, params, *, decode: bool = True,
        quant_scales=None,
    ):
        if cfg.data.num_frames < 2:
            raise ValueError(
                f"StreamingPETRv2 needs a 2-frame config, got num_frames="
                f"{cfg.data.num_frames} ({cfg.name})"
            )
        import dataclasses

        from petr_tpu.configs.config import eval_model_config

        cfg = dataclasses.replace(cfg, model=eval_model_config(cfg.model))
        if quant_scales is not None:
            cfg = dataclasses.replace(
                cfg,
                model=dataclasses.replace(
                    cfg.model,
                    backbone=dataclasses.replace(cfg.model.backbone, quant="int8"),
                ),
            )
        self.cfg = cfg
        self.params = params
        self.num_cams = 6
        input_hw = tuple(cfg.data.image_size)

        feature_net = PETRFeatureNet(cfg.model)
        head_net = PETRHeadNet(cfg.model, input_hw)

        def feat_fn(p, images):
            variables = {"params": p}
            if quant_scales is not None:
                variables["quant"] = quant_scales
            return feature_net.apply(variables, images)

        def head_fn(p, cur_feats, prev_feats, img2lidar, img_hw, timestamp):
            feats = jnp.concatenate([cur_feats, prev_feats], axis=1)
            out = head_net.apply(
                {"params": p}, feats, img2lidar, img_hw, timestamp=timestamp
            )
            if not decode:
                return out
            dec = jax.vmap(
                lambda cl, co: nms_free_decode(
                    cl,
                    co,
                    max_num=cfg.max_det,
                    num_classes=cfg.model.head.num_classes,
                    post_center_range=cfg.post_center_range,
                    score_threshold=cfg.score_threshold,
                )
            )
            return dec(out["cls_logits"][-1], out["bbox_codes"][-1])

        self._feat_fn = jax.jit(feat_fn)
        self._head_fn = jax.jit(head_fn)
        self._prev_feats: Optional[jax.Array] = None

    def reset(self) -> None:
        """Drop the cached frame (scene boundary)."""
        self._prev_feats = None

    def prime(self, images) -> None:
        """Warm the cache with the PREVIOUS frame's 6 views (scene start).

        A deployment's camera stream exists before the first keyframe, and
        offline info records store that sweep (`streaming_sample` returns its
        images as ``prev_images``) — priming with it makes the streaming
        path reproduce the full 12-view eval exactly on scene-start frames
        instead of degrading to the self-padded pad_empty path.
        """
        self._prev_feats = self._feat_fn(self.params, jnp.asarray(images))

    def step(
        self,
        images,
        img2lidar,
        img_hw,
        timestamp=None,
    ) -> Dict[str, jax.Array]:
        images = jnp.asarray(images)
        if images.shape[1] != self.num_cams:
            raise ValueError(
                f"step expects the current frame's {self.num_cams} views, got "
                f"{images.shape[1]} — pass 6 views; the previous 6 are cached"
            )
        cur = self._feat_fn(self.params, images)
        prev = cur if self._prev_feats is None else self._prev_feats
        out = self._head_fn(
            self.params,
            cur,
            prev,
            jnp.asarray(img2lidar),
            jnp.asarray(img_hw),
            None if timestamp is None else jnp.asarray(timestamp),
        )
        self._prev_feats = cur
        return out


def lidar2global(l2e_rot, l2e_trans, e2g_rot, e2g_trans) -> np.ndarray:
    """4x4 lidar->global from calibrated-sensor + ego-pose (R, t) pairs.

    Same chain the info builder composes per frame
    (`petr_tpu/data/info.py::_sensor_to_lidar`, reference
    `nuscenes_converter.py:280-340`); exposed for streaming deployments that
    receive live poses instead of pre-built info files.
    """
    l2e = np.eye(4)
    l2e[:3, :3] = np.asarray(l2e_rot, np.float64)
    l2e[:3, 3] = np.asarray(l2e_trans, np.float64)
    e2g = np.eye(4)
    e2g[:3, :3] = np.asarray(e2g_rot, np.float64)
    e2g[:3, 3] = np.asarray(e2g_trans, np.float64)
    return e2g @ l2e


def align_prev_lidar2img(
    prev_lidar2img: np.ndarray,  # (..., N, 4, 4) in the PREVIOUS lidar frame
    prev_lidar2global: np.ndarray,  # (4, 4)
    cur_lidar2global: np.ndarray,  # (4, 4)
) -> np.ndarray:
    """Re-express a previous frame's lidar2img in the CURRENT lidar frame.

    current-lidar point -> global -> previous lidar -> previous image; this is
    the ego-alignment the 30-frame info files bake into their sweep records
    (reference `README.md:76`), computed live for streaming. fp64 throughout —
    projection matrices are inverted downstream.
    """
    cur2prev = np.linalg.inv(np.asarray(prev_lidar2global, np.float64)) @ np.asarray(
        cur_lidar2global, np.float64
    )
    return np.asarray(prev_lidar2img, np.float64) @ cur2prev


def self_padded_timestamp(timestamp_6: np.ndarray, sweep_range=(3, 27)) -> np.ndarray:
    """First-frame (B, 12) timestamps from the current frame's (B, 6).

    Mirrors the data layer's pad-empty-sweeps convention
    (`petr_tpu/data/dataset.py::_select_cams`, reference `loading.py:69-78`):
    the padded previous frame repeats the current one with its timestamps
    offset by the mid-sweep mean time, so with_time sees a sane nonzero dt.
    """
    lo, hi = sweep_range
    mean_time = (lo + hi) / 2.0 * 0.083
    t = np.asarray(timestamp_6, dtype=np.float64)
    return np.concatenate([t, t + mean_time], axis=1)
