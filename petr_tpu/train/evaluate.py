"""In-training evaluation (the reference's mmcv EvalHook capability:
`evaluation = dict(interval=...)`, e.g. `petr_r50dcn_gridmask_p4.py:262`).

Runs NMS-free decode over a val dataset with the current params and returns
the self-contained nuScenes metric dict (mAP, NDS, per-TP-errors).

Multi-process (the reference's EvalHook-under-DDP capability): each process
decodes a disjoint stride of the val split on its local devices, the padded
per-sample decode arrays are exchanged with one `process_allgather`, and
every process computes (identical) full-split metrics — no rank-0 data
funnel, no torch.distributed gather of pickled lists.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _decode_dataset(cfg, params, ds, batch_size: int) -> Tuple[List[str], Dict[str, np.ndarray]]:
    """Decode every sample of ``ds``; returns (tokens, stacked det arrays)."""
    from petr_tpu.data import Loader
    from petr_tpu.train.train_step import make_eval_step

    loader = Loader(ds, batch_size, shuffle=False, drop_last=False)
    eval_step = jax.jit(make_eval_step(cfg))
    tokens: List[str] = []
    chunks: List[Dict[str, np.ndarray]] = []
    for batch in loader.epoch(0):
        toks = batch.pop("tokens")
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        det = jax.device_get(eval_step(params, jb))
        tokens.extend(toks)
        chunks.append({k: np.asarray(det[k]) for k in ("boxes", "scores", "labels", "valid")})
    if not chunks:
        return [], {}
    det = {k: np.concatenate([c[k] for c in chunks], axis=0)[: len(tokens)] for k in chunks[0]}
    return tokens, det


def _preds_from_det(tokens, det, info_by_token):
    from petr_tpu.metrics.nuscenes import boxes_from_arrays

    return {
        tok: boxes_from_arrays(
            tok, det["boxes"][i], det["scores"][i], det["labels"][i],
            det["valid"][i], info=info_by_token.get(tok),
        )
        for i, tok in enumerate(tokens)
    }


def evaluate_model(cfg, params, ds, batch_size: int = 1, classes=None) -> Dict[str, float]:
    """Decode + metrics over ``ds`` (a val-mode NuScenesDataset).

    ``classes`` restricts scoring (devkit semantics score ALL classes,
    counting no-GT classes as AP 0 — pass the present subset on restricted
    synthetic data)."""
    from petr_tpu.metrics.nuscenes import evaluate_detections, ground_truth_from_infos

    info_by_token = {info["token"]: info for info in ds.infos}
    tokens, det = _decode_dataset(cfg, params, ds, batch_size)
    preds = _preds_from_det(tokens, det, info_by_token)
    gts = ground_truth_from_infos(ds.infos)
    if classes is not None:
        return evaluate_detections(gts, preds, classes=classes)
    return evaluate_detections(gts, preds)


def evaluate_model_multiprocess(cfg, params, ds, batch_size: int = 1) -> Dict[str, float]:
    """Full-split eval under jax.distributed; call from ALL processes.

    Process p decodes samples ``infos[p::nproc]`` locally, pads its decode
    arrays to the common per-process maximum, and one ``process_allgather``
    makes every process's detections globally visible. All processes return
    the same full-split metric dict.

    The decode runs under a ONE-local-device mesh that shadows any ambient
    training mesh (``cli/train.py`` calls this inside
    ``with jax.set_mesh(pod_mesh)``): with the pod mesh ambient, the jit'd
    eval step would trace the model's `constrain()` sharding constraints
    into a cross-host program over data that is actually process-local —
    wrong results, and a deadlock whenever ``len(infos) % nproc != 0``
    (processes run different numbers of eval steps, so the extra step's
    collective has no peers). The local mesh keeps the training axis names
    (so `constrain()` specs resolve) but makes every constraint trivially
    local.
    """
    import copy

    nproc = jax.process_count()
    if nproc == 1:
        return evaluate_model(cfg, params, ds, batch_size)
    pid = jax.process_index()
    if len(ds.infos) < nproc:
        # raise on EVERY process (the split size is globally known) — a
        # one-sided raise would strand the other processes in the gather
        raise ValueError(
            f"evaluate_model_multiprocess: {len(ds.infos)} val samples "
            f"< {nproc} processes — every process would not get a shard"
        )

    local_ds = copy.copy(ds)
    local_ds.infos = list(ds.infos)[pid::nproc]
    params_host = jax.device_get(params)  # replicated -> every shard local
    from petr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    # ONE local device per process is intentional, not an oversight: the
    # stride's tail batch (drop_last=False) can be any size, so a
    # multi-device data axis would need divisibility padding through the
    # decode + metric path for a phase that is a tiny fraction of training
    # wall time. Hosts wanting device-parallel eval should shard the val
    # split one-process-per-device instead (each process claims one device).
    local_mesh = jax.sharding.Mesh(
        np.asarray(jax.local_devices()[:1]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS)
    )
    with jax.set_mesh(local_mesh):
        tokens, det = _decode_dataset(cfg, params_host, local_ds, batch_size)

    n_max = (len(ds.infos) + nproc - 1) // nproc
    n_local = len(tokens)

    def pad(x):
        if n_local == n_max:
            return x
        shape = (n_max - n_local,) + x.shape[1:]
        return np.concatenate([x, np.zeros(shape, x.dtype)], axis=0)

    payload = {k: pad(v) for k, v in det.items()}
    payload["n_valid"] = np.asarray([n_local], np.int32)

    from jax.experimental import multihost_utils

    gathered = jax.device_get(multihost_utils.process_allgather(payload))

    from petr_tpu.metrics.nuscenes import evaluate_detections, ground_truth_from_infos

    info_by_token = {info["token"]: info for info in ds.infos}
    preds = {}
    for p in range(nproc):
        toks = [info["token"] for info in list(ds.infos)[p::nproc]]
        n_p = int(gathered["n_valid"][p][0])
        assert n_p == len(toks), (n_p, len(toks))
        det_p = {k: gathered[k][p] for k in ("boxes", "scores", "labels", "valid")}
        preds.update(_preds_from_det(toks, det_p, info_by_token))
    gts = ground_truth_from_infos(ds.infos)
    return evaluate_detections(gts, preds)
