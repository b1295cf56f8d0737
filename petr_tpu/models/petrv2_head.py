"""PETRv2 head: PETR + feature-guided PE (FPE), temporal velocity
normalization, and grouped regression branches.

Behavioral reference: `models/dense_heads/petrv2_head.py` (sty61010/PETR):
  * FPE (`:48-60, :464-466`): the 3D coords PE is gated elementwise by
    sigmoid(conv(relu(conv(projected_features)))).
  * with_time (`:499-505, :520-521`): per-image timestamps (lidar-relative
    seconds, (B, 2*6)) -> mean inter-frame delta; velocity outputs divided
    by it so the net predicts displacement, not velocity.
  * RegLayer (`:63-95`): shared trunk + per-group MLPs over a (2,1,3,2,2)
    partition of the 10 code dims (partition boundaries are arbitrary; the
    loss imposes the semantics).
  * branches are deep-copied per decoder layer (`:304-307`), unlike PETR.

Temporal input handling is transparent: two frames arrive as 12 cameras
(`petr3d.py:84-85` treats N uniformly).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from petr_tpu.models.layers import MLP, SELayer, TorchLinear
from petr_tpu.models.petr_head import ClsBranch, PositionEncoder, RegBranch
from petr_tpu.models.transformer import PETRTransformer
from petr_tpu.ops.geometry import (
    inverse_sigmoid,
    pos2posemb3d,
    position_coords_3d,
    sine_posemb_2d_multiview,
)

Dtype = Any


class RegLayer(nn.Module):
    embed_dim: int
    num_fcs: int
    group_dims: Tuple[int, ...] = (2, 1, 3, 2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # torch nn.Linear default init throughout (reference RegLayer uses
        # bare `Linear`, `petrv2_head.py:63-95`); nn.Dense's lecun_normal +
        # zero bias was an init-parity gap
        for i in range(self.num_fcs):
            x = TorchLinear(self.embed_dim, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        outs = []
        for g, dim in enumerate(self.group_dims):
            y = TorchLinear(self.embed_dim, dtype=self.dtype, name=f"task{g}_fc")(x)
            y = nn.relu(y)
            outs.append(TorchLinear(dim, dtype=self.dtype, name=f"task{g}_out")(y))
        return jnp.concatenate(outs, axis=-1)


class PETRv2Head(nn.Module):
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
    depth_mode: str = "LID"
    with_multiview: bool = True
    with_fpe: bool = True
    with_time: bool = True
    with_multi_reg: bool = True
    position_range: Sequence[float] = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dropout_rate: float = 0.1
    shared_branches: bool = False
    deterministic: bool = True
    remat: bool = True
    use_flash: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,  # (B, N, H, W, Cin), N = views*frames
        img2lidar: jax.Array,  # (B, N, 4, 4)
        img_hw: jax.Array,  # (B, N, 2)
        pad_hw: Tuple[int, int],
        *,
        timestamp: Optional[jax.Array] = None,  # (B, N) lidar-relative seconds
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
            tuple(self.position_range),
            depth_num=self.depth_num,
            depth_start=self.depth_start,
            depth_mode=self.depth_mode,
        )
        coords3d = inverse_sigmoid(coords3d)
        pos_embed = PositionEncoder(self.embed_dim, dtype=self.dtype, name="position_encoder")(
            coords3d.astype(self.dtype)
        )
        if self.with_fpe:
            pos_embed = SELayer(self.embed_dim, dtype=self.dtype, name="fpe")(pos_embed, x)

        if self.with_multiview:
            sin_embed = sine_posemb_2d_multiview(masks, num_feats=self.embed_dim // 2)
            sin_embed = MLP(
                (self.embed_dim * 4, self.embed_dim), dtype=self.dtype, name="adapt_pos3d"
            )(sin_embed.astype(self.dtype))
            pos_embed = pos_embed + sin_embed

        reference_points = self.param(
            "reference_points",
            nn.initializers.uniform(scale=1.0),
            (self.num_query, 3),
            jnp.float32,
        )
        query_embed = MLP(
            (self.embed_dim, self.embed_dim), dtype=self.dtype, name="query_embedding"
        )(pos2posemb3d(reference_points).astype(self.dtype))

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
        )(x, masks, query_embed, pos_embed)
        outs_dec = jnp.nan_to_num(outs_dec)

        if self.with_time:
            assert timestamp is not None, "with_time head requires timestamps"
            ts = timestamp.astype(jnp.float32).reshape(B, -1, 6)
            mean_dt = (ts[:, 1, :] - ts[:, 0, :]).mean(-1)  # (B,)
            # guard degenerate timestamps (padded/duplicated sweeps give
            # dt ~ 0; the reference would emit inf velocities here) — clamp
            # |dt| away from zero, keeping sign
            mean_dt = jnp.where(
                jnp.abs(mean_dt) < 1e-3, jnp.where(mean_dt < 0, -1e-3, 1e-3), mean_dt
            )

        ref = inverse_sigmoid(reference_points)

        def make_branches(suffix):
            cls_b = ClsBranch(
                self.embed_dim, self.num_reg_fcs, self.num_classes, self.dtype,
                name=f"cls_branch{suffix}",
            )
            if self.with_multi_reg:
                reg_b = RegLayer(
                    self.embed_dim, self.num_reg_fcs, dtype=self.dtype,
                    name=f"reg_branch{suffix}",
                )
            else:
                reg_b = RegBranch(
                    self.embed_dim, self.num_reg_fcs, self.code_size, self.dtype,
                    name=f"reg_branch{suffix}",
                )
            return cls_b, reg_b

        if self.shared_branches:
            shared = make_branches("")

        cls_list, reg_list = [], []
        for lvl in range(self.num_layers):
            cls_b, reg_b = shared if self.shared_branches else make_branches(f"_{lvl}")
            cls_out = cls_b(outs_dec[lvl])
            reg_out = reg_b(outs_dec[lvl]).astype(jnp.float32)

            xy = jax.nn.sigmoid(reg_out[..., 0:2] + ref[None, :, 0:2])
            z = jax.nn.sigmoid(reg_out[..., 4:5] + ref[None, :, 2:3])
            vel = reg_out[..., 8:]
            if self.with_time:
                vel = vel / mean_dt[:, None, None]
            reg_out = jnp.concatenate(
                [xy, reg_out[..., 2:4], z, reg_out[..., 5:8], vel], axis=-1
            )
            cls_list.append(cls_out.astype(jnp.float32))
            reg_list.append(reg_out)

        all_cls = jnp.stack(cls_list)
        all_reg = jnp.stack(reg_list)

        pc = jnp.asarray(self.pc_range, jnp.float32)
        cx = all_reg[..., 0:1] * (pc[3] - pc[0]) + pc[0]
        cy = all_reg[..., 1:2] * (pc[4] - pc[1]) + pc[1]
        cz = all_reg[..., 4:5] * (pc[5] - pc[2]) + pc[2]
        all_reg = jnp.concatenate(
            [cx, cy, all_reg[..., 2:4], cz, all_reg[..., 5:]], axis=-1
        )
        return {"cls_logits": all_cls, "bbox_codes": all_reg}
