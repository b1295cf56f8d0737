"""Object-DGCNN family: k-NN graph query attention, pillar voxelization, and
a BEV DETR head (LiDAR-point paradigm; not used by shipped configs but part
of the reference's capability surface).

Behavioral references (sty61010/PETR):
  * `models/utils/dgcnn_attn.py:10-96` — DGCNNAttn: pairwise-distance top-K
    neighbor graph (NOTE: the reference takes the K *largest* distances —
    reproduced faithfully), edge features cat(neighbor, query) -> 1x1
    conv+BN+ReLU, max over neighbors; two stacked edge convs summed, residual.
  * `models/dense_heads/dgcnn3d_head.py` — DETR-style decoder over flattened
    BEV features. ``attn_kind`` selects the cross-attention: "dense" (masked
    attention over BEV tokens — MXU-friendly at these token counts) or
    "deformable" (the reference's MSDeformAttn paradigm via
    `ops/deformable.py`, sampling P points per head around each query's BEV
    reference).
  * mmdet3d hard voxelization (CUDA) -> pillar scatter re-designed as a
    static-shape device scatter-mean over a BEV grid.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from petr_tpu.models.layers import FFN, MultiheadAttention
from petr_tpu.models.petr_head import ClsBranch, RegBranch
from petr_tpu.ops.deformable import MSDeformableAttention
from petr_tpu.ops.geometry import inverse_sigmoid

Dtype = Any


def pillar_scatter(
    points: jax.Array,  # (P, 3+F) xyz + features, padded
    point_valid: jax.Array,  # (P,)
    pc_range: Sequence[float],
    grid_hw: Tuple[int, int],
) -> jax.Array:
    """Scatter points into a BEV pillar grid by mean; returns (H, W, 3+F+1)
    with an occupancy channel. Static shapes: P padded, fixed grid."""
    H, W = grid_hw
    pr = jnp.asarray(pc_range, jnp.float32)
    xy = points[:, :2]
    gx = ((xy[:, 0] - pr[0]) / (pr[3] - pr[0]) * W).astype(jnp.int32)
    gy = ((xy[:, 1] - pr[1]) / (pr[4] - pr[1]) * H).astype(jnp.int32)
    inb = (gx >= 0) & (gx < W) & (gy >= 0) & (gy < H) & point_valid
    flat = jnp.where(inb, gy * W + gx, H * W)  # dump slot
    feats = jnp.where(inb[:, None], points, 0.0)
    summed = jnp.zeros((H * W + 1, points.shape[1]), jnp.float32).at[flat].add(feats)
    counts = jnp.zeros((H * W + 1,), jnp.float32).at[flat].add(inb.astype(jnp.float32))
    mean = summed / jnp.maximum(counts[:, None], 1.0)
    occ = (counts > 0).astype(jnp.float32)[:, None]
    grid = jnp.concatenate([mean, occ], -1)[: H * W]
    return grid.reshape(H, W, points.shape[1] + 1)


def _denormalize_codes(all_reg: jax.Array, pc_range: Sequence[float]) -> jax.Array:
    """sigmoid-space (cx, cy, cz at index 4) -> metric pc_range coords."""
    pc = jnp.asarray(pc_range, jnp.float32)
    cx = all_reg[..., 0:1] * (pc[3] - pc[0]) + pc[0]
    cy = all_reg[..., 1:2] * (pc[4] - pc[1]) + pc[1]
    cz = all_reg[..., 4:5] * (pc[5] - pc[2]) + pc[2]
    return jnp.concatenate([cx, cy, all_reg[..., 2:4], cz, all_reg[..., 5:]], -1)


class DGCNNAttn(nn.Module):
    """k-NN graph 'attention' over queries (edge conv x2, max-pool)."""

    embed_dim: int
    K: int = 16
    dropout_rate: float = 0.1
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    def _edge_feats(self, q: jax.Array, K: int) -> Tuple[jax.Array, jax.Array]:
        # q: (B, N, C); affinity by euclidean distance, top-K largest
        K = min(K, q.shape[1])
        d2 = jnp.sum((q[:, :, None, :] - q[:, None, :, :]) ** 2, -1)
        _, topk = jax.lax.top_k(jnp.sqrt(jnp.maximum(d2, 0.0)), K)  # (B, N, K)
        neigh = jnp.take_along_axis(q[:, None, :, :].repeat(q.shape[1], 1), topk[..., None], 2)
        center = jnp.broadcast_to(q[:, :, None, :], neigh.shape)
        return jnp.concatenate([neigh, center], -1)  # (B, N, K, 2C)

    @nn.compact
    def __call__(self, query: jax.Array, query_pos: Optional[jax.Array] = None) -> jax.Array:
        # query: (B, N, C)
        residual = query
        if query_pos is not None:
            query = query + query_pos

        def edge_conv(x, name):
            y = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype, name=f"{name}_fc")(x)
            y = nn.LayerNorm(dtype=self.dtype, name=f"{name}_norm")(y)
            y = nn.relu(y)
            return y.max(axis=2)  # max over K neighbors

        e1 = edge_conv(self._edge_feats(query, self.K), "conv1")
        e2 = edge_conv(self._edge_feats(e1, self.K), "conv2")
        out = e1 + e2
        out = nn.Dropout(self.dropout_rate, deterministic=self.deterministic, name="drop")(out)
        return residual + out


class DeformableDetrDecoderLayer(nn.Module):
    """mmcv ``DetrTransformerDecoderLayer`` with deformable cross-attention
    (operation order self_attn -> norm -> cross_attn -> norm -> ffn -> norm),
    the per-layer body of `models/utils/detr.py:34-115`."""

    embed_dim: int
    num_heads: int = 8
    ffn_dim: int = 512
    num_points: int = 4
    dropout_rate: float = 0.1
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, Q, C)
        query_pos: jax.Array,  # (B, Q, C)
        value_levels,  # per level (B, H_l, W_l, C)
        ref_2d: jax.Array,  # (B, Q, 2) normalized
    ) -> jax.Array:
        qp = query + query_pos
        sa = MultiheadAttention(
            self.embed_dim, self.num_heads, self.dropout_rate, self.dtype,
            name="self_attn",
        )(qp, qp, query, deterministic=self.deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(query + sa)
        ca = MSDeformableAttention(
            self.embed_dim, self.num_heads, self.num_points, self.dtype,
            name="cross_attn",
        )(x + query_pos, value_levels, ref_2d)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x + ca)
        x = x + FFN(
            self.ffn_dim, self.embed_dim, self.dropout_rate, self.dtype,
            torch_bias=True, name="ffn",
        )(x, deterministic=self.deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(x)


class Deformable3DDetrDecoder(nn.Module):
    """The reference's ``Deformable3DDetrTransformerDecoder``
    (`models/utils/detr.py:34-115`): a deformable-DETR decoder whose 2-coord
    reference points are refined per layer against the first two dims of the
    10-dim regression output —
    ``new_ref = sigmoid(reg[..., :2] + inverse_sigmoid(ref))`` then DETACHED
    (`:99-104`). Owns the per-layer reg branches (upstream with_box_refine
    shares them with the head; here the decoder returns the per-layer reg
    outputs so the head decodes boxes from the exact tensors that refined
    the references).

    Returns (states (L, B, Q, C), refs_in (L, B, Q, 2), regs (L, B, Q, code)),
    where ``refs_in[l]`` is the reference INPUT to layer l (what upstream's
    head uses to decode layer l's boxes).
    """

    embed_dim: int
    num_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 512
    num_points: int = 4
    code_size: int = 10
    num_reg_fcs: int = 2
    dropout_rate: float = 0.1
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, Q, C)
        query_pos: jax.Array,  # (B, Q, C)
        value_levels,  # per level (B, H_l, W_l, C)
        reference_points: jax.Array,  # (B, Q, 2) normalized
    ):
        ref = reference_points.astype(jnp.float32)
        states, refs_in, regs = [], [], []
        for lid in range(self.num_layers):
            query = DeformableDetrDecoderLayer(
                self.embed_dim, self.num_heads, self.ffn_dim, self.num_points,
                self.dropout_rate, self.deterministic, self.dtype,
                name=f"layer{lid}",
            )(query, query_pos, value_levels, ref)
            reg = RegBranch(
                self.embed_dim, self.num_reg_fcs, self.code_size, self.dtype,
                name=f"reg_branch_{lid}",
            )(query).astype(jnp.float32)
            states.append(query)
            refs_in.append(ref)
            regs.append(reg)
            # 2-coord refinement vs the 10-dim reg output (detr.py:99-104)
            ref = jax.lax.stop_gradient(
                jax.nn.sigmoid(reg[..., :2] + inverse_sigmoid(ref))
            )
        return jnp.stack(states), jnp.stack(refs_in), jnp.stack(regs)


class DGCNN3DHead(nn.Module):
    """DETR head over BEV feature tokens with DGCNN query self-attention."""

    num_classes: int = 10
    embed_dim: int = 256
    num_query: int = 300
    num_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 512
    num_reg_fcs: int = 2
    code_size: int = 10
    knn: int = 16
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dropout_rate: float = 0.1
    deterministic: bool = True
    attn_kind: str = "dense"  # "dense" | "deformable"
    # "inline": the layer loop below (3-coord ref refinement).
    # "deformable_detr": the reference's Deformable3DDetrTransformerDecoder
    # (`models/utils/detr.py:34-115`) — 2-coord refs refined vs the 10-dim
    # reg output, z decoded without a reference.
    decoder_kind: str = "inline"
    num_points: int = 4  # sampling points per head (deformable)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, bev_feats: jax.Array) -> Dict[str, jax.Array]:
        """bev_feats: (B, H, W, C) BEV feature map."""
        B, H, W, _ = bev_feats.shape
        C = self.embed_dim
        bev = nn.Dense(C, dtype=self.dtype, name="input_proj")(bev_feats)
        tokens = bev.reshape(B, H * W, C)

        query_embed = self.param(
            "query_embedding", nn.initializers.normal(1.0), (self.num_query, 2 * C), jnp.float32
        )
        query_pos, query = jnp.split(query_embed.astype(self.dtype), 2, -1)
        query_pos = jnp.broadcast_to(query_pos[None], (B, self.num_query, C))
        query = jnp.broadcast_to(query[None], (B, self.num_query, C))

        if self.decoder_kind == "deformable_detr":
            return self._deformable_detr_decode(query, query_pos, bev)

        ref = jax.nn.sigmoid(
            nn.Dense(3, dtype=jnp.float32, name="reference_points")(query_pos.astype(jnp.float32))
        )

        cls_list, reg_list = [], []
        for lvl in range(self.num_layers):
            query = DGCNNAttn(
                C, self.knn, self.dropout_rate, self.deterministic, self.dtype,
                name=f"layer{lvl}_dgcnn",
            )(query, query_pos)
            query = nn.LayerNorm(dtype=self.dtype, name=f"layer{lvl}_norm1")(query)
            if self.attn_kind == "deformable":
                ca = MSDeformableAttention(
                    C, self.num_heads, self.num_points, self.dtype,
                    name=f"layer{lvl}_cross",
                )(query + query_pos, [bev], ref[..., :2])
            else:
                ca = MultiheadAttention(
                    C, self.num_heads, self.dropout_rate, self.dtype, name=f"layer{lvl}_cross"
                )(query + query_pos, tokens, tokens, deterministic=self.deterministic)
            query = nn.LayerNorm(dtype=self.dtype, name=f"layer{lvl}_norm2")(query + ca)
            # Deformable-DETR-style per-parameter xavier pass skips biases
            query = query + FFN(
                self.ffn_dim, C, self.dropout_rate, self.dtype,
                torch_bias=True, name=f"layer{lvl}_ffn",
            )(query, deterministic=self.deterministic)
            query = nn.LayerNorm(dtype=self.dtype, name=f"layer{lvl}_norm3")(query)

            cls_out = ClsBranch(C, self.num_reg_fcs, self.num_classes, self.dtype,
                                name=f"cls_branch_{lvl}")(query)
            reg_out = RegBranch(C, self.num_reg_fcs, self.code_size, self.dtype,
                                name=f"reg_branch_{lvl}")(query).astype(jnp.float32)
            ref_is = inverse_sigmoid(ref)
            xy = jax.nn.sigmoid(reg_out[..., 0:2] + ref_is[..., 0:2])
            z = jax.nn.sigmoid(reg_out[..., 4:5] + ref_is[..., 2:3])
            reg_dec = jnp.concatenate([xy, reg_out[..., 2:4], z, reg_out[..., 5:]], -1)
            cls_list.append(cls_out.astype(jnp.float32))
            reg_list.append(reg_dec)
            ref = jax.lax.stop_gradient(jnp.concatenate([xy, z], -1))

        all_cls = jnp.stack(cls_list)
        all_reg = jnp.stack(reg_list)
        return {
            "cls_logits": all_cls,
            "bbox_codes": _denormalize_codes(all_reg, self.pc_range),
        }

    def _deformable_detr_decode(self, query, query_pos, bev) -> Dict[str, jax.Array]:
        """Reference ``Deformable3DDetrTransformerDecoder`` path: 2-coord
        refs, per-layer detach refinement, z decoded without a reference."""
        C = self.embed_dim
        ref2 = jax.nn.sigmoid(
            nn.Dense(2, dtype=jnp.float32, name="reference_points")(
                query_pos.astype(jnp.float32)
            )
        )
        states, refs_in, regs = Deformable3DDetrDecoder(
            C, self.num_layers, self.num_heads, self.ffn_dim, self.num_points,
            self.code_size, self.num_reg_fcs, self.dropout_rate,
            self.deterministic, self.dtype, name="decoder",
        )(query, query_pos, [bev], ref2)

        cls_list, reg_list = [], []
        for lvl in range(self.num_layers):
            cls_out = ClsBranch(C, self.num_reg_fcs, self.num_classes, self.dtype,
                                name=f"cls_branch_{lvl}")(states[lvl])
            ref_is = inverse_sigmoid(refs_in[lvl])
            xy = jax.nn.sigmoid(regs[lvl][..., 0:2] + ref_is)
            z = jax.nn.sigmoid(regs[lvl][..., 4:5])
            reg_dec = jnp.concatenate(
                [xy, regs[lvl][..., 2:4], z, regs[lvl][..., 5:]], -1
            )
            cls_list.append(cls_out.astype(jnp.float32))
            reg_list.append(reg_dec)
        return {
            "cls_logits": jnp.stack(cls_list),
            "bbox_codes": _denormalize_codes(jnp.stack(reg_list), self.pc_range),
        }


def pillar_decorate(
    points: jax.Array,  # (P, 3+F)
    point_valid: jax.Array,  # (P,)
    pc_range: Sequence[float],
    grid_hw: Tuple[int, int],
):
    """Per-point pillar assignment + PointPillars feature decoration.

    Returns (decorated (P, 3+F+5), flat pillar id (P,), in-bounds mask (P,)).
    Decoration = [raw point features, xyz - pillar cluster mean,
    xy - pillar geometric center] — the PillarFeatureNet input
    (``_with_cluster_center`` + ``_with_voxel_center`` in mmdet3d's
    PillarFeatureNet, the pts_voxel_encoder of `obj_dgcnn.py:34-48`).
    Everything is a dense static-shape op: the per-pillar mean is one
    scatter-add + gather instead of a (V, K) hard-voxelization layout.
    """
    H, W = grid_hw
    pr = jnp.asarray(pc_range, jnp.float32)
    vx = (pr[3] - pr[0]) / W
    vy = (pr[4] - pr[1]) / H
    gx = jnp.floor((points[:, 0] - pr[0]) / vx).astype(jnp.int32)
    gy = jnp.floor((points[:, 1] - pr[1]) / vy).astype(jnp.int32)
    inb = (gx >= 0) & (gx < W) & (gy >= 0) & (gy < H) & point_valid
    flat = jnp.where(inb, gy * W + gx, H * W)  # dump slot for invalid

    # per-pillar cluster mean of xyz (scatter-add then gather back)
    xyz = jnp.where(inb[:, None], points[:, :3], 0.0)
    sums = jnp.zeros((H * W + 1, 3), jnp.float32).at[flat].add(xyz)
    cnts = jnp.zeros((H * W + 1,), jnp.float32).at[flat].add(inb.astype(jnp.float32))
    mean = sums / jnp.maximum(cnts[:, None], 1.0)
    cluster_off = points[:, :3] - mean[flat]

    # pillar geometric center offsets
    cx = pr[0] + (gx.astype(jnp.float32) + 0.5) * vx
    cy = pr[1] + (gy.astype(jnp.float32) + 0.5) * vy
    center_off = jnp.stack([points[:, 0] - cx, points[:, 1] - cy], -1)

    dec = jnp.concatenate([points, cluster_off, center_off], -1)
    return jnp.where(inb[:, None], dec, 0.0), flat, inb


class PillarFeatureNet(nn.Module):
    """PointPillars voxel encoder + scatter, TPU-native.

    mmdet3d runs hard voxelization (CUDA) -> per-pillar (V, K) point MLP ->
    max over K -> PointPillarsScatter. Here the shared point MLP runs as ONE
    dense (B, P, F) matmul over all (padded) points — MXU-friendly, no
    ragged (V, K) layout — and the max-over-pillar-points is a scatter-max
    straight into the BEV canvas, which IS the middle encoder. Norm is
    LayerNorm instead of BatchNorm1d (no cross-batch sync under pjit; the
    per-point normalization axis is the same).
    """

    out_channels: int = 64
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    grid_hw: Tuple[int, int] = (128, 128)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, points: jax.Array, point_valid: jax.Array) -> jax.Array:
        """points (B, P, 3+F) padded, point_valid (B, P) -> (B, H, W, C)."""
        H, W = self.grid_hw
        dec, flat, inb = jax.vmap(
            lambda p, v: pillar_decorate(p, v, self.pc_range, self.grid_hw)
        )(points, point_valid)
        f = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype, name="pfn_fc")(
            dec.astype(self.dtype)
        )
        f = nn.LayerNorm(dtype=self.dtype, name="pfn_norm")(f)
        f = nn.relu(f).astype(jnp.float32)

        neg = jnp.finfo(jnp.float32).min
        f = jnp.where(inb[..., None], f, neg)

        def scatter_max(feats, ids):
            canvas = jnp.full((H * W + 1, self.out_channels), neg, jnp.float32)
            canvas = canvas.at[ids].max(feats)
            canvas = jnp.where(canvas <= neg / 2, 0.0, canvas)  # empty pillars
            return canvas[: H * W].reshape(H, W, self.out_channels)

        return jax.vmap(scatter_max)(f, flat).astype(self.dtype)


class SECONDBackbone(nn.Module):
    """SECOND-style strided dense BEV backbone (the pts_backbone of
    `obj_dgcnn.py:34-48`): per stage one stride-s conv then ``layer_nums``
    3x3 convs, each conv+norm+ReLU; returns all stage maps."""

    channels: Sequence[int] = (64, 128, 256)
    layer_nums: Sequence[int] = (3, 5, 5)
    strides: Sequence[int] = (2, 2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        outs = []
        for s, (ch, n, st) in enumerate(zip(self.channels, self.layer_nums, self.strides)):
            x = nn.Conv(ch, (3, 3), strides=(st, st), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"stage{s}_conv0")(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"stage{s}_norm0")(x)
            x = nn.relu(x)
            for i in range(n):
                x = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False,
                            dtype=self.dtype, name=f"stage{s}_conv{i + 1}")(x)
                x = nn.LayerNorm(dtype=self.dtype, name=f"stage{s}_norm{i + 1}")(x)
                x = nn.relu(x)
            outs.append(x)
        return outs


class SECONDFPN(nn.Module):
    """SECOND neck: per-stage transposed-conv upsampling to a common stride,
    channel concat (the pts_neck of `obj_dgcnn.py:34-48`)."""

    out_channels: Sequence[int] = (128, 128, 128)
    upsample_strides: Sequence[int] = (1, 2, 4)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats) -> jax.Array:
        ups = []
        for i, (f, ch, st) in enumerate(zip(feats, self.out_channels, self.upsample_strides)):
            if st > 1:
                y = nn.ConvTranspose(ch, (st, st), strides=(st, st), use_bias=False,
                                     dtype=self.dtype, name=f"deblock{i}")(f)
            else:
                y = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f"deblock{i}")(f)
            y = nn.LayerNorm(dtype=self.dtype, name=f"deblock{i}_norm")(y)
            ups.append(nn.relu(y))
        return jnp.concatenate(ups, -1)


class ObjDGCNN(nn.Module):
    """LiDAR detector: PillarFeatureNet -> SECOND backbone -> SECOND FPN ->
    DGCNN3D head (the full pts pipeline of `obj_dgcnn.py:34-48`:
    voxelize -> voxel encoder -> middle encoder -> backbone -> neck)."""

    num_classes: int = 10
    embed_dim: int = 128
    grid_hw: Tuple[int, int] = (128, 128)
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    num_query: int = 300
    num_layers: int = 3
    pillar_channels: int = 64
    backbone_channels: Sequence[int] = (64, 128, 256)
    backbone_layer_nums: Sequence[int] = (3, 5, 5)
    neck_channels: Sequence[int] = (128, 128, 128)
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, points: jax.Array, point_valid: jax.Array) -> Dict[str, jax.Array]:
        """points: (B, P, 3+F) padded; point_valid: (B, P)."""
        canvas = PillarFeatureNet(
            self.pillar_channels, tuple(self.pc_range), self.grid_hw,
            self.dtype, name="pts_voxel_encoder",
        )(points, point_valid)
        stages = SECONDBackbone(
            tuple(self.backbone_channels), tuple(self.backbone_layer_nums),
            dtype=self.dtype, name="pts_backbone",
        )(canvas)
        bev = SECONDFPN(
            tuple(self.neck_channels),
            tuple(2 ** i for i in range(len(stages))),
            dtype=self.dtype, name="pts_neck",
        )(stages)
        return DGCNN3DHead(
            num_classes=self.num_classes,
            embed_dim=self.embed_dim,
            num_query=self.num_query,
            num_layers=self.num_layers,
            pc_range=tuple(self.pc_range),
            deterministic=self.deterministic,
            dtype=self.dtype,
            name="head",
        )(bev)
