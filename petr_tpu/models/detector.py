"""PETR3D detector assembly: grid-mask -> backbone -> neck -> head.

Behavioral reference: `models/detectors/petr3d.py` (sty61010/PETR):
`extract_img_feat` (:68-99) folds views into the batch axis for the backbone
and unfolds after the neck; the head consumes one FPN level.

The detector is a single flax module whose ``__call__`` is pure; train/eval
steps jit it. Inputs arrive as a ``Batch`` dict of statically-shaped arrays.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from petr_tpu.configs.config import ModelConfig
from petr_tpu.models.fpn import CPFPN
from petr_tpu.models.grid_mask import grid_mask
from petr_tpu.models.petr_head import PETRHead
from petr_tpu.models.petrv2_head import PETRv2Head
from petr_tpu.models.resnet import ResNet
from petr_tpu.models.vovnet import VoVNet


def _remat_scope(cfg: ModelConfig) -> str:
    scope = getattr(cfg, "remat_scope", "all")
    if scope not in ("all", "backbone", "decoder"):
        raise ValueError(f"remat_scope must be all|backbone|decoder, got {scope!r}")
    return scope


def _backbone_neck_feature(cfg: ModelConfig, images: jax.Array, dtype) -> jax.Array:
    """Backbone + neck, returning the head-level feature map (B, N, fh, fw, fc).

    Must run inside an ``nn.compact`` ``__call__``. Submodule names are fixed
    ("backbone", "neck") so every module built on this helper — the full
    ``PETRDetector`` and the ``PETRFeatureNet`` slice — shares one param tree.
    """
    B, N, H, W, C = images.shape
    x = images.reshape(B * N, H, W, C).astype(dtype)
    bb_remat = cfg.remat and _remat_scope(cfg) in ("all", "backbone")

    if cfg.backbone.kind == "vovnet":
        feats = VoVNet(
            spec=cfg.backbone.spec,
            out_indices=cfg.backbone.out_indices,
            remat=bb_remat,
            dtype=dtype,
            quant=cfg.backbone.quant,
            bn_mode=cfg.backbone.bn_mode,
            name="backbone",
        )(x)
    elif cfg.backbone.kind == "resnet":
        if cfg.backbone.quant != "none":
            raise NotImplementedError(
                "backbone.quant is only supported for the VoVNet backbone"
            )
        depth = int(cfg.backbone.spec[1:])
        feats = ResNet(
            depth=depth,
            out_indices=cfg.backbone.out_indices,
            dcn_stages=cfg.backbone.dcn_stages,
            remat_stages=bb_remat,
            dtype=dtype,
            bn_mode=cfg.backbone.bn_mode,
            name="backbone",
        )(x)
    else:
        raise ValueError(cfg.backbone.kind)

    if cfg.backbone.with_fpn:
        feats = CPFPN(
            out_channels=cfg.backbone.fpn_out_channels,
            num_outs=cfg.backbone.fpn_num_outs,
            dtype=dtype,
            name="neck",
        )(feats)

    f = feats[cfg.head_feat_level]
    fh, fw, fc = f.shape[-3:]
    return f.reshape(B, N, fh, fw, fc)


def _apply_head(
    cfg: ModelConfig,
    f: jax.Array,  # (B, N, fh, fw, fc)
    img2lidar: jax.Array,
    img_hw: jax.Array,
    input_hw: Tuple[int, int],
    deterministic: bool,
    dtype,
    *,
    timestamp: Optional[jax.Array] = None,
    gt_boxes: Optional[jax.Array] = None,
    gt_valid: Optional[jax.Array] = None,
    lidar2img: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Construct and call the configured head (submodule name "head").

    Must run inside an ``nn.compact`` ``__call__``; shared between
    ``PETRDetector`` and the ``PETRHeadNet`` slice.
    """
    hcfg = cfg.head
    head_kwargs = dict(
        num_classes=hcfg.num_classes,
        in_channels=f.shape[-1],
        embed_dim=hcfg.embed_dim,
        num_query=hcfg.num_query,
        num_layers=hcfg.num_layers,
        num_heads=hcfg.num_heads,
        ffn_dim=hcfg.ffn_dim,
        code_size=hcfg.code_size,
        depth_num=hcfg.depth_num,
        depth_start=hcfg.depth_start,
        depth_mode=hcfg.depth_mode,
        with_multiview=hcfg.with_multiview,
        position_range=tuple(hcfg.position_range),
        pc_range=tuple(hcfg.pc_range),
        dropout_rate=hcfg.dropout_rate,
        shared_branches=hcfg.shared_branches,
        deterministic=deterministic,
        remat=cfg.remat and _remat_scope(cfg) in ("all", "decoder"),
        use_flash=cfg.use_flash_attention,
        dtype=dtype,
        name="head",
    )
    kind = getattr(hcfg, "kind", "petr")
    if kind == "petrv2" or hcfg.with_fpe or hcfg.with_time or hcfg.with_multi_reg:
        return PETRv2Head(
            with_fpe=hcfg.with_fpe,
            with_time=hcfg.with_time,
            with_multi_reg=hcfg.with_multi_reg,
            **head_kwargs,
        )(f, img2lidar, img_hw, input_hw, timestamp=timestamp)
    if kind == "depthr":
        from petr_tpu.models.depthr_head import DepthrHead

        assert gt_boxes is not None and lidar2img is not None, (
            "Depthr (GT-depth oracle) needs gt_boxes/gt_valid/lidar2img"
        )
        return DepthrHead(
            depth_map_down_scale=hcfg.depth_map_down_scale,
            depth_encoder_down_scale=hcfg.depth_encoder_down_scale,
            depth_bins=hcfg.depth_bins,
            depth_map_min=hcfg.depth_map_min,
            depth_map_max=hcfg.depth_map_max,
            **head_kwargs,
        )(
            f, img2lidar, img_hw, input_hw,
            gt_boxes=gt_boxes, gt_valid=gt_valid, lidar2img=lidar2img,
        )
    return PETRHead(**head_kwargs)(f, img2lidar, img_hw, input_hw)


class PETRDetector(nn.Module):
    config: ModelConfig
    deterministic: bool = True

    @nn.compact
    def __call__(
        self,
        images: jax.Array,  # (B, N, H, W, 3) normalized; (B, A, N, H, W, 3)
        #                     for TTA — features are averaged over the A aug
        #                     variants before the head (reference `aug_test`,
        #                     petr3d.py:239-247)
        img2lidar: jax.Array,  # (B, N, 4, 4)
        img_hw: jax.Array,  # (B, N, 2)
        *,
        timestamp: Optional[jax.Array] = None,  # (B, N) for v2 with_time
        grid_mask_rng: Optional[jax.Array] = None,
        # Depthr oracle inputs (GT depth maps built in-model)
        gt_boxes: Optional[jax.Array] = None,
        gt_valid: Optional[jax.Array] = None,
        lidar2img: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        num_aug = 1
        if images.ndim == 6:
            B, num_aug, N = images.shape[:3]
            images = images.reshape(B * num_aug, *images.shape[2:])
        B_eff, N, H, W, C = images.shape

        if cfg.use_grid_mask and grid_mask_rng is not None and not self.deterministic:
            images = grid_mask(grid_mask_rng, images, exact=cfg.grid_mask_exact)

        B = B_eff
        f = _backbone_neck_feature(cfg, images, dtype)
        if num_aug > 1:
            # TTA: mean of extracted features over aug variants
            fh, fw, fc = f.shape[-3:]
            B = B // num_aug
            f = f.reshape(B, num_aug, N, fh, fw, fc).mean(axis=1)

        return _apply_head(
            cfg, f, img2lidar, img_hw, (H, W), self.deterministic, dtype,
            timestamp=timestamp, gt_boxes=gt_boxes, gt_valid=gt_valid,
            lidar2img=lidar2img,
        )


class PETRFeatureNet(nn.Module):
    """Backbone+neck slice of ``PETRDetector``.

    Emits the head-level per-view feature map from images alone. Param tree is
    the "backbone"/"neck" subtree of ``PETRDetector`` — full-detector params
    apply directly (flax ignores the unused "head" subtree). Used by the
    streaming PETRv2 runtime (`petr_tpu.serve.streaming`), which caches the
    previous frame's features instead of re-running the backbone on 12 views
    (the reference recomputes all 12 every sample, `petr3d.py:84-85` +
    `loading.py:45-118`).
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:  # (B, N, H, W, 3)
        return _backbone_neck_feature(
            self.config, images, jnp.dtype(self.config.compute_dtype)
        )


class PETRHeadNet(nn.Module):
    """Head slice of ``PETRDetector`` over precomputed features.

    ``input_hw`` is the static pre-backbone image (H, W) the features were
    extracted from (the head needs it for padding masks and PE stride).
    Param tree is the "head" subtree of ``PETRDetector``.
    """

    config: ModelConfig
    input_hw: Tuple[int, int]
    deterministic: bool = True

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,  # (B, N, fh, fw, fc)
        img2lidar: jax.Array,
        img_hw: jax.Array,
        *,
        timestamp: Optional[jax.Array] = None,
        gt_boxes: Optional[jax.Array] = None,
        gt_valid: Optional[jax.Array] = None,
        lidar2img: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        return _apply_head(
            self.config, feats, img2lidar, img_hw, tuple(self.input_hw),
            self.deterministic, jnp.dtype(self.config.compute_dtype),
            timestamp=timestamp, gt_boxes=gt_boxes, gt_valid=gt_valid,
            lidar2img=lidar2img,
        )
