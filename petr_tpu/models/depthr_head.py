"""Depthr head: PETR + depth-map-guided cross-attention (the fork's research
extension).

Behavioral reference (sty61010/PETR): `models/dense_heads/depthr_head.py`,
`models/utils/depthr_transformer.py`, `models/utils/multi_atten_decoder_layer.py`:
decoder op order self_attn -> norm -> cross_depth_attn -> norm ->
cross_view_attn -> norm -> ffn -> norm, where cross_depth_attn re-keys the
attention onto the depth tokens (key = value = depth_pos_embed, key PE =
depth_pos_embed; `multi_atten_decoder_layer.py:269-282`). Depth tokens come
from GT depth maps (oracle experiments) through DepthGTEncoder; map stride 8
x encoder downscale 4 matches the C5 feature stride 32, so the same padding
mask applies.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from petr_tpu.models.depth_encoder import (
    DepthGTEncoder,
    bin_depth_indices,
    gt_depth_maps,
)
from petr_tpu.models.layers import FFN, MLP, MultiheadAttention, TorchLinear
from petr_tpu.models.petr_head import ClsBranch, PositionEncoder, RegBranch
from petr_tpu.ops.geometry import (
    inverse_sigmoid,
    pos2posemb3d,
    position_coords_3d,
    sine_posemb_2d_multiview,
)

Dtype = Any


class DepthrDecoderLayer(nn.Module):
    """self_attn -> cross_depth_attn -> cross_view_attn -> ffn (post-norm).

    Faithful to the reference's ACTUAL computation: in
    `multi_atten_decoder_layer.py:269-282` the `cross_depth_attn` branch
    rebinds ``key = value = depth_pos_embed``, so the `cross_view_attn` that
    follows it in the shipped op order (config
    `depthr_r50dcn_c5_512_1408_gtdepth.py:120-126`) ALSO attends over the
    depth tokens — with the image positional embedding as its key PE — and
    the image feature memory is never attended in the decoder at all. We
    reproduce that (the fork's published oracle numbers come from this exact
    graph); ``attend_memory=True`` restores the presumably-intended
    cross-view attention over image features as an explicit design option.
    """

    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout_rate: float = 0.1
    deterministic: bool = True
    dtype: Dtype = jnp.float32
    attend_memory: bool = False

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        memory: jax.Array,
        query_pos: jax.Array,
        key_pos: jax.Array,
        depth_tokens: jax.Array,  # (B, L, C)
        key_padding_mask: Optional[jax.Array],
    ) -> jax.Array:
        det = self.deterministic
        drop = lambda name: nn.Dropout(self.dropout_rate, deterministic=det, name=name)

        q_in = query + query_pos
        sa = MultiheadAttention(
            self.embed_dim, self.num_heads, self.dropout_rate, self.dtype, name="self_attn"
        )(q_in, q_in, query, deterministic=det)
        query = query + drop("drop_sa")(sa)
        query = nn.LayerNorm(dtype=self.dtype, name="norm1")(query)

        # depth attention: keys/values are the depth tokens, with the depth
        # tokens also acting as key PE (reference adds them twice)
        da = MultiheadAttention(
            self.embed_dim, self.num_heads, self.dropout_rate, self.dtype, name="cross_depth_attn"
        )(
            query + query_pos,
            depth_tokens + depth_tokens,
            depth_tokens,
            key_padding_mask=key_padding_mask,
            deterministic=det,
        )
        query = query + drop("drop_da")(da)
        query = nn.LayerNorm(dtype=self.dtype, name="norm2")(query)

        # reference rebinding: unless attend_memory, cross_view keys/values
        # are ALSO the depth tokens (image PE as key PE) — see class docstring
        kv = memory if self.attend_memory else depth_tokens
        ca = MultiheadAttention(
            self.embed_dim, self.num_heads, self.dropout_rate, self.dtype, name="cross_view_attn"
        )(
            query + query_pos,
            kv + key_pos,
            kv,
            key_padding_mask=key_padding_mask,
            deterministic=det,
        )
        query = query + drop("drop_ca")(ca)
        query = nn.LayerNorm(dtype=self.dtype, name="norm3")(query)

        ffn_out = FFN(self.ffn_dim, self.embed_dim, self.dropout_rate, self.dtype, name="ffn")(
            query, deterministic=det
        )
        query = query + ffn_out
        query = nn.LayerNorm(dtype=self.dtype, name="norm4")(query)
        return query


class DepthrHead(nn.Module):
    num_classes: int = 10
    in_channels: int = 2048
    embed_dim: int = 256
    num_query: int = 900
    num_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    num_reg_fcs: int = 2
    code_size: int = 10
    depth_num: int = 64
    depth_start: float = 1.0
    depth_mode: str = "LID"
    with_multiview: bool = True
    position_range: Sequence[float] = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dropout_rate: float = 0.1
    shared_branches: bool = True
    deterministic: bool = True
    remat: bool = True
    use_flash: bool = False
    dtype: Dtype = jnp.float32
    # depth branch (DepthGTEncoder config, depthr config :58-68)
    depth_bins: int = 80
    depth_map_min: float = 1e-3
    depth_map_max: float = 60.0
    depth_map_down_scale: int = 8
    depth_encoder_down_scale: int = 4
    # False = reference-faithful (cross_view also attends depth tokens via
    # the key/value rebinding quirk); True = attend the image memory
    attend_memory: bool = False

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,  # (B, N, H, W, Cin)
        img2lidar: jax.Array,
        img_hw: jax.Array,
        pad_hw: Tuple[int, int],
        *,
        gt_boxes: jax.Array,  # (B, G, 9) gravity-center (oracle depth)
        gt_valid: jax.Array,  # (B, G)
        lidar2img: jax.Array,  # (B, N, 4, 4)
    ) -> Dict[str, jax.Array]:
        B, N, H, W, _ = feats.shape
        pad_h, pad_w = pad_hw

        ys = jnp.arange(H, dtype=jnp.float32) * (pad_h / H)
        xs = jnp.arange(W, dtype=jnp.float32) * (pad_w / W)
        valid_y = ys[None, None, :] < img_hw[..., 0:1].astype(jnp.float32)
        valid_x = xs[None, None, :] < img_hw[..., 1:2].astype(jnp.float32)
        masks = ~(valid_y[..., :, None] & valid_x[..., None, :])

        x = TorchLinear(self.embed_dim, dtype=self.dtype, name="input_proj")(feats)

        coords3d, _ = position_coords_3d(
            H, W, float(pad_h), float(pad_w), img2lidar,
            tuple(self.position_range), depth_num=self.depth_num,
            depth_start=self.depth_start, depth_mode=self.depth_mode,
        )
        coords3d = inverse_sigmoid(coords3d)
        pos_embed = PositionEncoder(self.embed_dim, dtype=self.dtype, name="position_encoder")(
            coords3d.astype(self.dtype)
        )
        if self.with_multiview:
            sin_embed = sine_posemb_2d_multiview(masks, num_feats=self.embed_dim // 2)
            sin_embed = MLP(
                (self.embed_dim * 4, self.embed_dim), dtype=self.dtype, name="adapt_pos3d"
            )(sin_embed.astype(self.dtype))
            pos_embed = pos_embed + sin_embed

        # --- depth branch: GT depth maps -> tokens -------------------------
        dmaps = gt_depth_maps(
            gt_boxes, gt_valid, lidar2img, (pad_h, pad_w), self.depth_map_down_scale
        )
        idx = bin_depth_indices(
            dmaps, "LID", self.depth_map_min, self.depth_map_max, self.depth_bins
        )
        onehot = jax.nn.one_hot(idx, self.depth_bins + 1, dtype=jnp.float32)
        depth_embed, _ = DepthGTEncoder(
            num_bins=self.depth_bins,
            depth_min=self.depth_map_min,
            depth_max=self.depth_map_max,
            embed_dim=self.embed_dim,
            down_scale=self.depth_encoder_down_scale,
            dtype=self.dtype,
            name="depth_gt_encoder",
        )(onehot)
        # feature grid and depth grid strides match (8 * 4 == 32 for C5)
        dh, dw = depth_embed.shape[2:4]
        assert (dh, dw) == (H, W), (
            f"depth token grid {(dh, dw)} must match feature grid {(H, W)}"
        )
        depth_tokens = depth_embed.reshape(B, N * H * W, self.embed_dim)

        reference_points = self.param(
            "reference_points", nn.initializers.uniform(scale=1.0),
            (self.num_query, 3), jnp.float32,
        )
        query_embed = MLP(
            (self.embed_dim, self.embed_dim), dtype=self.dtype, name="query_embedding"
        )(pos2posemb3d(reference_points).astype(self.dtype))

        memory = feats_tokens = x.reshape(B, N * H * W, self.embed_dim)
        key_pos = pos_embed.reshape(B, N * H * W, self.embed_dim).astype(self.dtype)
        key_padding_mask = masks.reshape(B, N * H * W)
        Q = self.num_query
        query_pos = jnp.broadcast_to(query_embed[None], (B, Q, self.embed_dim)).astype(self.dtype)
        query = jnp.zeros((B, Q, self.embed_dim), self.dtype)

        Layer = nn.remat(DepthrDecoderLayer) if self.remat else DepthrDecoderLayer
        post_norm = nn.LayerNorm(dtype=self.dtype, name="post_norm")
        outs = []
        for i in range(self.num_layers):
            query = Layer(
                self.embed_dim, self.num_heads, self.ffn_dim, self.dropout_rate,
                self.deterministic, self.dtype, self.attend_memory, name=f"layer{i}",
            )(query, memory, query_pos, key_pos, depth_tokens, key_padding_mask)
            outs.append(post_norm(query))
        outs_dec = jnp.nan_to_num(jnp.stack(outs, axis=0))

        ref = inverse_sigmoid(reference_points)

        def make_branches(suffix):
            return (
                ClsBranch(self.embed_dim, self.num_reg_fcs, self.num_classes, self.dtype,
                          name=f"cls_branch{suffix}"),
                RegBranch(self.embed_dim, self.num_reg_fcs, self.code_size, self.dtype,
                          name=f"reg_branch{suffix}"),
            )

        if self.shared_branches:
            # one application over the stacked (L, B, Q, C) layer axis —
            # a single GEMM instead of L launch-bound chains (identical
            # math/params; see petr_head.py)
            cls_b, reg_b = make_branches("")
            all_cls = cls_b(outs_dec).astype(jnp.float32)
            reg_out = reg_b(outs_dec).astype(jnp.float32)
            xy = jax.nn.sigmoid(reg_out[..., 0:2] + ref[None, None, :, 0:2])
            z = jax.nn.sigmoid(reg_out[..., 4:5] + ref[None, None, :, 2:3])
            all_reg = jnp.concatenate(
                [xy, reg_out[..., 2:4], z, reg_out[..., 5:]], axis=-1
            )
        else:
            cls_list, reg_list = [], []
            for lvl in range(self.num_layers):
                cls_b, reg_b = make_branches(f"_{lvl}")
                cls_out = cls_b(outs_dec[lvl])
                reg_out = reg_b(outs_dec[lvl]).astype(jnp.float32)
                xy = jax.nn.sigmoid(reg_out[..., 0:2] + ref[None, :, 0:2])
                z = jax.nn.sigmoid(reg_out[..., 4:5] + ref[None, :, 2:3])
                reg_out = jnp.concatenate(
                    [xy, reg_out[..., 2:4], z, reg_out[..., 5:]], axis=-1
                )
                cls_list.append(cls_out.astype(jnp.float32))
                reg_list.append(reg_out)
            all_cls = jnp.stack(cls_list)
            all_reg = jnp.stack(reg_list)
        pc = jnp.asarray(self.pc_range, jnp.float32)
        cx = all_reg[..., 0:1] * (pc[3] - pc[0]) + pc[0]
        cy = all_reg[..., 1:2] * (pc[4] - pc[1]) + pc[1]
        cz = all_reg[..., 4:5] * (pc[5] - pc[2]) + pc[2]
        all_reg = jnp.concatenate([cx, cy, all_reg[..., 2:4], cz, all_reg[..., 5:]], axis=-1)
        return {"cls_logits": all_cls, "bbox_codes": all_reg}
