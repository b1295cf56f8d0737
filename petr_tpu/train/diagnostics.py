"""Training-run diagnostics beyond scalar metrics.

``make_velocity_probe``: TP-matched velocity statistics on a val split —
the discriminator that separates "the temporal pathway is learning
cross-frame correspondence" from "the velocity head collapsed to the
degenerate v=0 solution" (round 4: the 8k-step PETRv2 synth run scored
mAVE 1.504 with predicted-velocity std 0.01 m/s — detection learned,
velocity did not; the one-batch overfit probe proved the head CAN learn
velocity, making it a recipe problem; this probe makes the distinction
visible at every eval boundary instead of post-mortem).

Reference context: PETRv2's headline gain over PETR is mostly velocity
(mAVE 0.889 -> 0.343 in the shipped eval printouts,
`projects/configs/petrv2/petrv2_vovnet_gridmask_p4_800x320.py:268-289`);
a temporal run whose mAVE tracks the predict-zero baseline has not
reproduced the capability regardless of its mAP.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


def make_velocity_probe(
    cfg,
    ds,
    batch_size: int = 4,
    score_thr: float = 0.15,
    dist_thr: float = 2.0,
) -> Callable[..., Dict[str, float]]:
    """Build a jit-once velocity probe over a val-mode dataset.

    The returned callable maps params -> stats over center-distance-matched
    (GT, detection) pairs:
        tp          matched pair count
        vel_err     mean L2 velocity error of predictions
        zero_err    the predict-zero baseline on the SAME pairs (mean |v_gt|)
        pred_std    std of predicted velocity components (0.0 = collapsed)
        gt_std      std of GT velocity components
        corr_vx/vy  per-component Pearson correlation (0.0 when degenerate)

    A healthy temporal model shows vel_err < zero_err and corr >> 0.
    """
    from petr_tpu.data import Loader
    from petr_tpu.train.train_step import make_eval_step

    eval_step = jax.jit(make_eval_step(cfg))
    loader = Loader(ds, batch_size, shuffle=False, drop_last=False)

    def probe(params) -> Dict[str, float]:
        pv, gv = [], []
        for batch in loader.epoch(0):
            batch.pop("tokens")
            gt = np.asarray(batch["gt_boxes"])
            gm = np.asarray(batch["gt_valid"])
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            det = jax.device_get(eval_step(params, jb))
            for i in range(len(det["boxes"])):
                boxes = np.asarray(det["boxes"][i])
                keep = (np.asarray(det["scores"][i]) > score_thr) & np.asarray(
                    det["valid"][i]
                )
                if not keep.any():
                    continue
                cand = boxes[keep]
                for g in gt[i][gm[i]]:
                    d = np.linalg.norm(cand[:, :2] - g[:2], axis=-1)
                    j = int(d.argmin())
                    if d[j] < dist_thr:
                        pv.append(cand[j, 7:9])
                        gv.append(g[7:9])
        if len(pv) < 3:
            return {"tp": float(len(pv))}
        pv_a, gv_a = np.asarray(pv), np.asarray(gv)
        out = {
            "tp": float(len(pv_a)),
            "vel_err": float(np.linalg.norm(pv_a - gv_a, axis=-1).mean()),
            "zero_err": float(np.linalg.norm(gv_a, axis=-1).mean()),
            "pred_std": float(pv_a.std()),
            "gt_std": float(gv_a.std()),
        }
        for k in range(2):
            c = 0.0
            if pv_a[:, k].std() > 1e-6 and gv_a[:, k].std() > 1e-6:
                c = float(np.corrcoef(pv_a[:, k], gv_a[:, k])[0, 1])
            out[f"corr_v{'xy'[k]}"] = c
        return out

    return probe
