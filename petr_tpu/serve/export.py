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


# --- streaming (feature-cached PETRv2) artifacts -----------------------------

def streaming_input_spec(
    cfg: ExperimentConfig, batch_size: int = 1
) -> Dict[str, jax.ShapeDtypeStruct]:
    """Per-frame inputs of the streaming runtime: images for the CURRENT 6
    views only; matrices/timestamps for all 12 (current first)."""
    if cfg.data.num_frames < 2:
        raise ValueError("streaming export needs a 2-frame (petrv2) config")
    N6 = cfg.data.num_views
    N = cfg.data.num_views * cfg.data.num_frames
    H, W = cfg.data.image_size
    return {
        "images": jax.ShapeDtypeStruct((batch_size, N6, H, W, 3), jnp.float32),
        "img2lidar": jax.ShapeDtypeStruct((batch_size, N, 4, 4), jnp.float32),
        "img_hw": jax.ShapeDtypeStruct((batch_size, N, 2), jnp.float32),
        "timestamp": jax.ShapeDtypeStruct((batch_size, N), jnp.float32),
    }


def make_streaming_fns(cfg: ExperimentConfig, quant_scales=None):
    """(feature_fn, head_fn) positional functions for export/jit.

    feature_fn(params, images6) -> feats (B, 6, fh, fw, fc)
    head_fn(params, cur_feats, prev_feats, img2lidar, img_hw, timestamp)
        -> decoded boxes dict (same as the offline serving fn)

    ``quant_scales`` enables the int8 PTQ backbone (cfg.model.backbone.quant
    must be "int8"); the scales are baked into the feature module.
    """
    from petr_tpu.models.detector import PETRFeatureNet, PETRHeadNet
    from petr_tpu.ops.nms_free import nms_free_decode

    from petr_tpu.configs.config import eval_model_config

    emc = eval_model_config(cfg.model)
    feature_net = PETRFeatureNet(emc)
    head_net = PETRHeadNet(emc, tuple(cfg.data.image_size))

    def feature_fn(params, images):
        variables = {"params": params}
        if quant_scales is not None:
            variables["quant"] = quant_scales
        return feature_net.apply(variables, images)

    def head_fn(params, cur, prev, img2lidar, img_hw, timestamp):
        feats = jnp.concatenate([cur, prev], axis=1)
        out = head_net.apply(
            {"params": params}, feats, img2lidar, img_hw, timestamp=timestamp
        )
        dec = jax.vmap(
            lambda cl, co: nms_free_decode(
                cl, co,
                max_num=cfg.max_det,
                num_classes=cfg.model.head.num_classes,
                post_center_range=cfg.post_center_range,
                score_threshold=cfg.score_threshold,
            )
        )
        return dec(out["cls_logits"][-1], out["bbox_codes"][-1])

    return feature_fn, head_fn


def export_streaming(
    cfg: ExperimentConfig,
    params: Mapping[str, Any],
    *,
    batch_size: int = 1,
    quant_scales=None,
    embed_params: bool = False,
    platforms: Optional[Sequence[str]] = None,
) -> Tuple[jax_export.Exported, jax_export.Exported]:
    """Export the streaming pair (feature extractor, head+decode)."""
    feature_fn, head_fn = make_streaming_fns(cfg, quant_scales)
    spec = streaming_input_spec(cfg, batch_size)
    feats_sds = jax.eval_shape(feature_fn, params, spec["images"])
    head_inputs = (
        feats_sds, feats_sds, spec["img2lidar"], spec["img_hw"], spec["timestamp"]
    )
    if embed_params:
        ef = jax_export.export(
            jax.jit(lambda im: feature_fn(params, im)), platforms=platforms
        )(spec["images"])
        eh = jax_export.export(
            jax.jit(lambda *a: head_fn(params, *a)), platforms=platforms
        )(*head_inputs)
    else:
        pspec = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            params,
        )
        ef = jax_export.export(jax.jit(feature_fn), platforms=platforms)(
            pspec, spec["images"]
        )
        eh = jax_export.export(jax.jit(head_fn), platforms=platforms)(
            pspec, *head_inputs
        )
    return ef, eh


def save_streaming_artifact(
    path: str,
    exported_pair: Tuple[jax_export.Exported, jax_export.Exported],
    cfg: ExperimentConfig,
    *,
    batch_size: int,
    embed_params: bool,
) -> None:
    ef, eh = exported_pair
    meta = {
        "format": "petr_tpu.serve/streaming-1",
        "config": cfg.name,
        "batch_size": batch_size,
        "embed_params": embed_params,
        "platforms": list(ef.platforms),
        "input_spec": {
            k: [list(v.shape), str(v.dtype)]
            for k, v in streaming_input_spec(cfg, batch_size).items()
        },
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr("feature.stablehlo", bytes(ef.serialize()))
        z.writestr("head.stablehlo", bytes(eh.serialize()))


class StreamingArtifactRunner:
    """Per-frame replay of a streaming artifact — no model code needed.

    Mirrors `petr_tpu.serve.StreamingPETRv2.step`: holds the previous frame's
    feature cache on device, self-pads the first frame. ``params`` is
    required unless the artifact was exported with embedded params.
    """

    def __init__(self, path: str, params: Optional[Mapping[str, Any]] = None):
        with zipfile.ZipFile(path) as z:
            self.meta = json.loads(z.read("meta.json"))
            if self.meta.get("format") != "petr_tpu.serve/streaming-1":
                raise ValueError(f"not a streaming artifact: {path}")
            ef = jax_export.deserialize(bytearray(z.read("feature.stablehlo")))
            eh = jax_export.deserialize(bytearray(z.read("head.stablehlo")))
        self._feat = jax.jit(ef.call)
        self._head = jax.jit(eh.call)
        if not self.meta["embed_params"] and params is None:
            raise ValueError("artifact exported without params; pass params=")
        self._params = params
        self._prev = None

    def reset(self) -> None:
        self._prev = None

    def step(self, images, img2lidar, img_hw, timestamp):
        args = () if self.meta["embed_params"] else (self._params,)
        cur = self._feat(*args, jnp.asarray(images))
        prev = cur if self._prev is None else self._prev
        out = self._head(
            *args, cur, prev, jnp.asarray(img2lidar), jnp.asarray(img_hw),
            jnp.asarray(timestamp),
        )
        self._prev = cur
        return out
