"""PETR detection head: 3D position embedding + query decoder + branches.

Behavioral reference: `models/dense_heads/petr_head.py` (sty61010/PETR).
Pipeline (`:366-468`): padding masks -> 1x1 input projection -> 3D PE from
frustum back-projection (`:286-334`) + camera-aware 2D sine PE -> 900 learned
reference points -> query embeddings -> 6-layer decoder -> per-layer
cls/reg branches with center offsets added to inverse-sigmoid references.

TPU-first deltas:
  * channels-last (B, N, H, W, C); static shapes; masks precomputed from an
    ``img_hw`` meta array instead of python loops over metas.
  * the frustum back-projection consumes precomputed ``img2lidar`` matrices
    (host inverts lidar2img in fp64 at data time — no per-step np.linalg.inv
    in the hot path as in the reference `:308-314`).
  * PE computed in fp32, decoder compute in ``dtype`` (bf16 on TPU).

Checkpoint-import note: cls/reg branches are **shared** across decoder
layers in PETR (same module applied per layer, `:244-247`); PETRv2 deep-copies
instead. Controlled by ``shared_branches``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from petr_tpu.models.layers import MLP, TorchLinear, torch_kernel_init
from petr_tpu.models.transformer import PETRTransformer
from petr_tpu.ops.geometry import (
    inverse_sigmoid,
    pos2posemb3d,
    position_coords_3d,
    sine_posemb_2d_multiview,
)

Dtype = Any


class PositionEncoder(nn.Module):
    """conv-MLP 3*D -> 4*C -> C over the frustum coordinate channels
    (1x1 convs == per-pixel MLP; implemented as Dense on channels-last)."""

    embed_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coords3d: jax.Array) -> jax.Array:
        x = TorchLinear(self.embed_dim * 4, dtype=self.dtype, name="fc1")(coords3d)
        x = nn.relu(x)
        return TorchLinear(self.embed_dim, dtype=self.dtype, name="fc2")(x)


class NormedLinear(nn.Module):
    """mmdet NormedLinear: cosine-style classifier — normalized weights x
    normalized(+power) features, temperature-scaled (used when the reference
    config sets ``normedlinear=True``)."""

    out: int
    tempearture: float = 20.0  # (sic) mmdet's spelling/defaults
    power: float = 1.0
    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", torch_kernel_init, (x.shape[-1], self.out), jnp.float32
        )
        bias = self.param("bias", self.bias_init, (self.out,), jnp.float32)
        w = kernel / (
            jnp.power(jnp.linalg.norm(kernel, axis=0, keepdims=True), self.power) + self.eps
        )
        xf = x.astype(jnp.float32)
        xn = xf / (jnp.power(jnp.linalg.norm(xf, axis=-1, keepdims=True), self.power) + self.eps)
        return ((xn * self.tempearture) @ w + bias).astype(self.dtype)


class ClsBranch(nn.Module):
    """(Dense+LN+ReLU) x num_reg_fcs + Dense(num_classes); out-bias at the
    focal prior -log((1-0.01)/0.01). ``normed`` swaps the final Dense for a
    NormedLinear (reference ``normedlinear`` flag)."""

    embed_dim: int
    num_reg_fcs: int
    out: int
    dtype: Dtype = jnp.float32
    normed: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_reg_fcs):
            x = TorchLinear(self.embed_dim, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = nn.relu(x)
        if self.normed:
            # reference applies the focal-prior bias to m[-1] whether it is a
            # Linear or a NormedLinear (petr_head.py:282-284)
            return NormedLinear(
                self.out, dtype=self.dtype,
                bias_init=nn.initializers.constant(-4.59511985013459),
                name="out",
            )(x)
        return TorchLinear(
            self.out,
            dtype=self.dtype,
            bias_init=nn.initializers.constant(-4.59511985013459),
            name="out",
        )(x)


class RegBranch(nn.Module):
    """(Dense+ReLU) x num_reg_fcs + Dense(code_size)."""

    embed_dim: int
    num_reg_fcs: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_reg_fcs):
            x = TorchLinear(self.embed_dim, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        return TorchLinear(self.out, dtype=self.dtype, name="out")(x)


class PETRHead(nn.Module):
    num_classes: int = 10
    in_channels: int = 256
    embed_dim: int = 256
    num_query: int = 900
    num_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    num_reg_fcs: int = 2
    code_size: int = 10
    depth_num: int = 64
    depth_start: float = 1.0
    depth_mode: str = "LID"  # LID=True in all shipped configs
    with_multiview: bool = True
    position_range: Sequence[float] = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dropout_rate: float = 0.1
    shared_branches: bool = True
    deterministic: bool = True
    remat: bool = True
    use_flash: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,  # (B, N, H, W, Cin) — selected FPN level
        img2lidar: jax.Array,  # (B, N, 4, 4) fp32
        img_hw: jax.Array,  # (B, N, 2) valid (h, w) per view before padding
        pad_hw: Tuple[int, int],  # static padded input (H, W)
    ) -> Dict[str, jax.Array]:
        B, N, H, W, _ = feats.shape
        pad_h, pad_w = pad_hw

        # --- padding masks at feature resolution (True = padded) -----------
        ys = (jnp.arange(H, dtype=jnp.float32) + 0.0) * (pad_h / H)
        xs = (jnp.arange(W, dtype=jnp.float32) + 0.0) * (pad_w / W)
        valid_y = ys[None, None, :] < img_hw[..., 0:1].astype(jnp.float32)  # (B,N,H)
        valid_x = xs[None, None, :] < img_hw[..., 1:2].astype(jnp.float32)  # (B,N,W)
        masks = ~(valid_y[..., :, None] & valid_x[..., None, :])  # (B,N,H,W)

        # --- input projection ---------------------------------------------
        x = TorchLinear(self.embed_dim, dtype=self.dtype, name="input_proj")(feats)

        # --- 3D position embedding (fp32) ---------------------------------
        coords3d, _ = position_coords_3d(
            H, W, float(pad_h), float(pad_w), img2lidar,
            tuple(self.position_range),
            depth_num=self.depth_num,
            depth_start=self.depth_start,
            depth_mode=self.depth_mode,
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

        # --- queries --------------------------------------------------------
        reference_points = self.param(
            "reference_points",
            nn.initializers.uniform(scale=1.0),
            (self.num_query, 3),
            jnp.float32,
        )
        query_embed = MLP(
            (self.embed_dim, self.embed_dim), dtype=self.dtype, name="query_embedding"
        )(pos2posemb3d(reference_points).astype(self.dtype))

        # --- decoder --------------------------------------------------------
        outs_dec = PETRTransformer(
            self.num_layers,
            self.embed_dim,
            self.num_heads,
            self.ffn_dim,
            self.dropout_rate,
            self.deterministic,
            self.remat,
            self.use_flash,
            self.dtype,
            name="transformer",
        )(x, masks, query_embed, pos_embed)  # (L, B, Q, C)
        outs_dec = jnp.nan_to_num(outs_dec)

        # --- per-layer branches --------------------------------------------
        ref = inverse_sigmoid(reference_points)  # (Q, 3) fp32

        def make_branches(suffix):
            cls_b = ClsBranch(
                self.embed_dim, self.num_reg_fcs, self.num_classes, self.dtype,
                name=f"cls_branch{suffix}",
            )
            reg_b = RegBranch(
                self.embed_dim, self.num_reg_fcs, self.code_size, self.dtype,
                name=f"reg_branch{suffix}",
            )
            return cls_b, reg_b

        if self.shared_branches:
            # ONE application over the stacked (L, B, Q, C) outputs: Dense/LN
            # broadcast over leading axes, so this is a single GEMM of L*B*Q
            # rows instead of L sequential launch-bound chains of tiny
            # matmuls — identical math and identical param tree (the module
            # is the same shared instance the loop applied L times).
            cls_b, reg_b = make_branches("")
            all_cls = cls_b(outs_dec).astype(jnp.float32)
            reg_out = reg_b(outs_dec).astype(jnp.float32)
            # centers: offset + inverse_sigmoid(ref), then sigmoid (cx,cy @0:2, cz @4)
            xy = jax.nn.sigmoid(reg_out[..., 0:2] + ref[None, None, :, 0:2])
            z = jax.nn.sigmoid(reg_out[..., 4:5] + ref[None, None, :, 2:3])
            all_reg = jnp.concatenate(
                [xy, reg_out[..., 2:4], z, reg_out[..., 5:]], axis=-1
            )  # (L, B, Q, code_size)
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
            all_cls = jnp.stack(cls_list)  # (L, B, Q, num_classes)
            all_reg = jnp.stack(reg_list)  # (L, B, Q, code_size)

        # de-normalize centers into metric pc_range
        pc = jnp.asarray(self.pc_range, jnp.float32)
        cx = all_reg[..., 0:1] * (pc[3] - pc[0]) + pc[0]
        cy = all_reg[..., 1:2] * (pc[4] - pc[1]) + pc[1]
        cz = all_reg[..., 4:5] * (pc[5] - pc[2]) + pc[2]
        all_reg = jnp.concatenate(
            [cx, cy, all_reg[..., 2:4], cz, all_reg[..., 5:]], axis=-1
        )
        return {"cls_logits": all_cls, "bbox_codes": all_reg}
