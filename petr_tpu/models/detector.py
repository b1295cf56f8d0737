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
            images = grid_mask(grid_mask_rng, images)

        B = B_eff
        x = images.reshape(B * N, H, W, C).astype(dtype)

        if cfg.backbone.kind == "vovnet":
            feats = VoVNet(
                spec=cfg.backbone.spec,
                out_indices=cfg.backbone.out_indices,
                remat=cfg.remat,
                dtype=dtype,
                quant=cfg.backbone.quant,
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
                remat_stages=cfg.remat,
                dtype=dtype,
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

        lvl = cfg.head_feat_level
        f = feats[lvl]
        fh, fw, fc = f.shape[-3:]
        f = f.reshape(B, N, fh, fw, fc)
        if num_aug > 1:
            # TTA: mean of extracted features over aug variants
            B = B // num_aug
            f = f.reshape(B, num_aug, N, fh, fw, fc).mean(axis=1)

        hcfg = cfg.head
        head_kwargs = dict(
            num_classes=hcfg.num_classes,
            in_channels=fc,
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
            deterministic=self.deterministic,
            remat=cfg.remat,
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
            )(f, img2lidar, img_hw, (H, W), timestamp=timestamp)
        if kind == "depthr":
            from petr_tpu.models.depthr_head import DepthrHead

            assert gt_boxes is not None and lidar2img is not None, (
                "Depthr (GT-depth oracle) needs gt_boxes/gt_valid/lidar2img"
            )
            return DepthrHead(**head_kwargs)(
                f, img2lidar, img_hw, (H, W),
                gt_boxes=gt_boxes, gt_valid=gt_valid, lidar2img=lidar2img,
            )
        return PETRHead(**head_kwargs)(f, img2lidar, img_hw, (H, W))
