"""AOT serving export via ``jax.export`` (StableHLO serialization).

Artifact format: a zip with ``meta.json`` (config name, input spec, flags)
and ``module.stablehlo`` (the serialized exported module). When
``embed_params=True`` the parameters are baked into the module as
constants — one self-contained file deploys the model; otherwise the
serving process supplies the parameter pytree (flattened in canonical
``jax.tree`` order) at call time.

Reference analog: ``tools/misc/publish_model.py`` publishes a torch
checkpoint (weights only — the model code still ships separately); this
exports the *compiled computation* as well, which is the idiomatic TPU/XLA
deployment unit.
"""

from __future__ import annotations

import dataclasses
import io
import json
import zipfile
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from petr_tpu.configs.config import ExperimentConfig


def serving_input_spec(
    cfg: ExperimentConfig, batch_size: int = 1
) -> Dict[str, jax.ShapeDtypeStruct]:
    """Positional input spec (images, img2lidar, img_hw[, timestamp]) for a
    serving call at static ``batch_size``."""
    N = cfg.data.num_views * cfg.data.num_frames
    H, W = cfg.data.image_size
    spec = {
        "images": jax.ShapeDtypeStruct((batch_size, N, H, W, 3), jnp.float32),
        "img2lidar": jax.ShapeDtypeStruct((batch_size, N, 4, 4), jnp.float32),
        "img_hw": jax.ShapeDtypeStruct((batch_size, N, 2), jnp.float32),
    }
    if cfg.data.num_frames > 1:
        spec["timestamp"] = jax.ShapeDtypeStruct((batch_size, N), jnp.float32)
    return spec


def make_serving_fn(cfg: ExperimentConfig, quant_scales=None):
    """Forward + NMS-free decode as a positional-arg function
    ``fn(params, images, img2lidar, img_hw[, timestamp])`` (jit/export
    friendly — no dict batch, no GT inputs)."""
    if cfg.model.head.kind == "depthr":
        raise NotImplementedError(
            "the depthr head needs GT depth at test time (oracle); it has no "
            "serving path"
        )
    from petr_tpu.train.train_step import make_eval_step

    eval_step = make_eval_step(cfg, quant_scales)
    with_ts = cfg.data.num_frames > 1

    def fn(params, images, img2lidar, img_hw, *rest):
        batch = {"images": images, "img2lidar": img2lidar, "img_hw": img_hw}
        if with_ts:
            batch["timestamp"] = rest[0]
        return eval_step(params, batch)

    return fn


def export_serving(
    cfg: ExperimentConfig,
    params: Mapping[str, Any],
    *,
    batch_size: int = 1,
    quant_scales=None,
    embed_params: bool = False,
    platforms: Optional[Sequence[str]] = None,
) -> jax_export.Exported:
    """Trace + lower the serving step and return the Exported module."""
    fn = make_serving_fn(cfg, quant_scales)
    spec = serving_input_spec(cfg, batch_size)
    inputs = tuple(spec.values())
    if embed_params:
        exported = jax_export.export(
            jax.jit(lambda *a: fn(params, *a)), platforms=platforms
        )(*inputs)
    else:
        pspec = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            params,
        )
        exported = jax_export.export(jax.jit(fn), platforms=platforms)(
            pspec, *inputs
        )
    return exported


def save_artifact(
    path: str,
    exported: jax_export.Exported,
    cfg: ExperimentConfig,
    *,
    batch_size: int,
    embed_params: bool,
) -> None:
    meta = {
        "format": "petr_tpu.serve/1",
        "config": cfg.name,
        "batch_size": batch_size,
        "embed_params": embed_params,
        "platforms": list(exported.platforms),
        "input_spec": {
            k: [list(v.shape), str(v.dtype)]
            for k, v in serving_input_spec(cfg, batch_size).items()
        },
        "quant": cfg.model.backbone.quant,
    }
    blob = exported.serialize()
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr("module.stablehlo", bytes(blob))


def load_artifact(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Load an artifact -> (callable, meta).

    With ``embed_params`` the callable takes the positional inputs of
    ``meta["input_spec"]``; otherwise it takes ``(params, *inputs)``.
    """
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        if meta.get("format") != "petr_tpu.serve/1":
            raise ValueError(f"not a petr_tpu serving artifact: {path}")
        exported = jax_export.deserialize(bytearray(z.read("module.stablehlo")))
    return jax.jit(exported.call), meta
