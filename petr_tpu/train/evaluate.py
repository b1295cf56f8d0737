"""In-training evaluation (the reference's mmcv EvalHook capability:
`evaluation = dict(interval=...)`, e.g. `petr_r50dcn_gridmask_p4.py:262`).

Runs NMS-free decode over a val dataset with the current params and returns
the self-contained nuScenes metric dict (mAP, NDS, per-TP-errors).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def evaluate_model(cfg, params, ds, batch_size: int = 1) -> Dict[str, float]:
    """Decode + metrics over ``ds`` (a val-mode NuScenesDataset)."""
    from petr_tpu.data import Loader
    from petr_tpu.metrics.nuscenes import (
        boxes_from_arrays,
        evaluate_detections,
        ground_truth_from_infos,
    )
    from petr_tpu.train.train_step import make_eval_step

    loader = Loader(ds, batch_size, shuffle=False, drop_last=False)
    eval_step = jax.jit(make_eval_step(cfg))
    info_by_token = {info["token"]: info for info in ds.infos}
    preds = {}
    for batch in loader.epoch(0):
        tokens = batch.pop("tokens")
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        det = jax.device_get(eval_step(params, jb))
        for i, tok in enumerate(tokens):
            preds[tok] = boxes_from_arrays(
                tok, det["boxes"][i], det["scores"][i],
                det["labels"][i], det["valid"][i],
                info=info_by_token.get(tok),
            )
    gts = ground_truth_from_infos(ds.infos)
    return evaluate_detections(gts, preds)
