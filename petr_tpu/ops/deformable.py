"""Multi-scale deformable attention (the mmcv CUDA op's TPU-native form).

Capability reference: mmcv ``MultiScaleDeformableAttention`` as used by the
reference's deformable-DETR decoder (`models/utils/detr.py:34-115`) and
DGCNN3D configs. Each query predicts, per (head, level, point), a sampling
offset around its reference location and an attention weight
(softmax-normalized over level x point); outputs are attention-weighted sums
of bilinear samples.

Formulated as vectorized bilinear gathers + einsum — gathers of P points per
query batch well on TPU; a Pallas VMEM-tiled variant can slot in if profiles
demand it.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from petr_tpu.ops.sampling import bilinear_sample


def ms_deformable_attention(
    value_levels: Sequence[jax.Array],  # per level (B, H_l, W_l, nh, dh)
    ref_points: jax.Array,  # (B, Q, 2) normalized [0,1] (x, y)
    offsets: jax.Array,  # (B, Q, nh, L, P, 2) in pixel units of each level
    weights: jax.Array,  # (B, Q, nh, L, P) softmax-normalized over (L, P)
) -> jax.Array:
    """Returns (B, Q, nh, dh)."""
    B, Q, nh, L, P, _ = offsets.shape
    outs = []
    for lvl, val in enumerate(value_levels):
        _, H, W, _, dh = val.shape
        base = ref_points * jnp.asarray([W, H], jnp.float32) - 0.5  # align_corners=False
        xy = base[:, :, None, None, :] + offsets[:, :, :, lvl, :, :]  # (B, Q, nh, P, 2)

        def sample_one(v, pts):
            # v: (H, W, nh, dh); pts: (Q, nh, P, 2)
            def per_head(vh, ph):  # (H, W, dh), (Q, P, 2)
                return bilinear_sample(vh, ph)  # (Q, P, dh)

            return jax.vmap(per_head, in_axes=(2, 1), out_axes=1)(v, pts)  # (Q, nh, P, dh)

        s = jax.vmap(sample_one)(val, xy)  # (B, Q, nh, P, dh)
        outs.append(jnp.einsum("bqhpd,bqhp->bqhd", s, weights[:, :, :, lvl]))
    return sum(outs)


def deformable_attention_module_forward(
    query: jax.Array,  # (B, Q, C)
    value_levels: Sequence[jax.Array],  # per level (B, H_l, W_l, C)
    ref_points: jax.Array,  # (B, Q, 2)
    *,
    sampling_offsets_w: jax.Array,  # (C, nh*L*P*2)
    sampling_offsets_b: jax.Array,
    attn_weights_w: jax.Array,  # (C, nh*L*P)
    attn_weights_b: jax.Array,
    value_proj_w: jax.Array,  # (C, C)
    value_proj_b: jax.Array,
    out_proj_w: jax.Array,
    out_proj_b: jax.Array,
    num_heads: int,
    num_points: int,
) -> jax.Array:
    """Functional forward matching mmcv's module wiring (projection + offset/
    weight heads + output projection); parameters passed explicitly so flax
    modules or converted torch weights can drive it."""
    B, Q, C = query.shape
    L = len(value_levels)
    nh, P = num_heads, num_points
    dh = C // nh

    off = (query @ sampling_offsets_w + sampling_offsets_b).reshape(B, Q, nh, L, P, 2)
    w = (query @ attn_weights_w + attn_weights_b).reshape(B, Q, nh, L * P)
    w = jax.nn.softmax(w.astype(jnp.float32), -1).reshape(B, Q, nh, L, P)

    vals = []
    for v in value_levels:
        Bv, H, W, _ = v.shape
        pv = (v.reshape(B, H * W, C) @ value_proj_w + value_proj_b).reshape(B, H, W, nh, dh)
        vals.append(pv)
    out = ms_deformable_attention(vals, ref_points, off.astype(jnp.float32), w)
    return out.reshape(B, Q, C) @ out_proj_w + out_proj_b
