"""Calibration and scale persistence for the int8 PTQ serving path.

Calibration runs the model in ``quant="calib"`` mode: every quantized conv
records the running max-abs of its input into the "quant" flax collection
(apply with ``mutable=["quant"]``); the collection is threaded across
batches so the final tree holds the max over the whole calibration set.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def calibrate(
    model,
    params: Mapping[str, Any],
    batches: Iterable[Mapping[str, Any]],
) -> Dict[str, Any]:
    """Run calibration batches through a ``quant="calib"`` model.

    ``batches`` yields keyword-argument dicts for ``model.apply`` (arrays
    only). Returns the "quant" collection (running max-abs per quantized
    conv input) as a numpy tree.
    """

    @jax.jit
    def step(params, quant, batch):
        _, updated = model.apply(
            {"params": params, "quant": quant}, **batch, mutable=["quant"]
        )
        return updated["quant"]

    quant = None
    for batch in batches:
        batch = {k: v for k, v in batch.items() if v is not None}
        if quant is None:
            # first batch initializes the collection's structure
            _, updated = model.apply(
                {"params": params}, **batch, mutable=["quant"]
            )
            quant = updated["quant"]
        else:
            quant = step(params, quant, dict(batch))
    if quant is None:
        raise ValueError("calibrate() needs at least one batch")
    return jax.tree.map(np.asarray, jax.device_get(quant))


def calibrate_detector(cfg, params, batches, **detector_kwargs):
    """Calibrate a PETRDetector built from ``cfg`` (any quant setting).

    ``batches`` yields loader-format dicts with at least
    images/img2lidar/img_hw (timestamp passed through when present).
    Returns the "quant" scale tree for int8 apply.
    """
    from petr_tpu.models import PETRDetector

    from petr_tpu.configs.config import eval_model_config

    # eval_model_config: a bn_mode="batch"-trained checkpoint calibrates on
    # its frozen EMA stats like every other eval/serving path (the int8
    # ConvBNReLU folding requires frozen BN)
    mcfg = eval_model_config(cfg.model)
    calib_cfg = dataclasses.replace(
        mcfg, backbone=dataclasses.replace(mcfg.backbone, quant="calib"),
    )
    model = PETRDetector(calib_cfg, deterministic=True, **detector_kwargs)

    def as_kwargs(batch):
        out = {
            "images": batch["images"],
            "img2lidar": batch["img2lidar"],
            "img_hw": batch["img_hw"],
        }
        if batch.get("timestamp") is not None:
            out["timestamp"] = batch["timestamp"]
        return out

    return calibrate(model, params, (as_kwargs(b) for b in batches))


def _flatten(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_scales(path: str, quant_tree: Mapping[str, Any]) -> None:
    """Persist a "quant" collection as an .npz of path-keyed arrays."""
    np.savez(path, **_flatten(jax.device_get(quant_tree)))


def load_scales(path: str) -> Dict[str, Any]:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})
