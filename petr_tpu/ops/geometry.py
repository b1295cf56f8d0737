"""Camera-frustum geometry and positional-embedding primitives.

Pure JAX, fp32. These reproduce the math of the reference PETR head
(`projects/mmdet3d_plugin/models/dense_heads/petr_head.py:31-43,286-334` and
`models/utils/positional_encoding.py:15-110` in sty61010/PETR) in a
TPU-friendly, channels-last, statically-shaped formulation.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * math.pi


def inverse_sigmoid(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Numerically-clamped logit; matches mmdet's ``inverse_sigmoid``."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.maximum(x, eps)
    x2 = jnp.maximum(1.0 - x, eps)
    return jnp.log(x1 / x2)


def _sincos_interleave(pos: jax.Array, num_feats: int, temperature: float) -> jax.Array:
    """sin/cos embedding of a scalar channel.

    ``pos[..., None] / t^(2*(i//2)/F)`` then interleave sin(even)/cos(odd) so
    out[..., 2k] = sin(pos / t^(2k/F)), out[..., 2k+1] = cos(pos / t^(2k/F)).
    """
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)
    ang = pos[..., None] / dim_t  # (..., F)
    return jnp.stack([jnp.sin(ang[..., 0::2]), jnp.cos(ang[..., 1::2])], axis=-1).reshape(
        *ang.shape[:-1], num_feats
    )


def _sincos_block(pos: jax.Array, num_feats: int, temperature: float) -> jax.Array:
    """sin/cos embedding in BLOCK order: [sin(pos/t_k) for k | cos(pos/t_k) for k].

    This is what the reference's ``SinePositionalEncoding3D`` actually emits
    (`positional_encoding.py:90-99`): its ``torch.stack(..., dim=4)`` inserts
    the pair axis BEFORE the frequency axis of the 5-d tensor, unlike
    ``pos2posemb3d``'s ``dim=-1`` which interleaves. Checkpoint import of
    ``adapt_pos3d`` requires matching this channel order exactly.
    """
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)
    ang = pos[..., None] / dim_t  # (..., F)
    return jnp.concatenate([jnp.sin(ang[..., 0::2]), jnp.cos(ang[..., 1::2])], axis=-1)


def pos2posemb3d(
    pos: jax.Array, num_pos_feats: int = 128, temperature: float = 10000.0
) -> jax.Array:
    """Sinusoidal embedding of normalized 3D points.

    Args:
        pos: (..., 3) points in [0, 1].
    Returns:
        (..., 3*num_pos_feats) embedding ordered (y, x, z) — the reference's
        channel order (`petr_head.py:42`).
    """
    pos = pos.astype(jnp.float32) * TWO_PI
    emb_x = _sincos_interleave(pos[..., 0], num_pos_feats, temperature)
    emb_y = _sincos_interleave(pos[..., 1], num_pos_feats, temperature)
    emb_z = _sincos_interleave(pos[..., 2], num_pos_feats, temperature)
    return jnp.concatenate([emb_y, emb_x, emb_z], axis=-1)


def depth_bins(
    depth_num: int,
    depth_start: float,
    depth_max: float,
    mode: str = "LID",
) -> jax.Array:
    """Depth-bin centers along the camera ray.

    LID (linear-increasing discretization, `petr_head.py:293-298`):
        d_i = start + bin * i * (i+1),  bin = (max-start) / (D*(D+1))
    UD (uniform):
        d_i = start + i * (max-start)/D
    """
    index = jnp.arange(depth_num, dtype=jnp.float32)
    if mode == "LID":
        bin_size = (depth_max - depth_start) / (depth_num * (1 + depth_num))
        return depth_start + bin_size * index * (index + 1.0)
    elif mode == "UD":
        bin_size = (depth_max - depth_start) / depth_num
        return depth_start + bin_size * index
    raise ValueError(f"unknown depth mode {mode!r}")


def frustum_coords(
    feat_h: int,
    feat_w: int,
    pad_h: float,
    pad_w: float,
    coords_d: jax.Array,
) -> jax.Array:
    """Per-pixel homogeneous frustum points, shape (H, W, D, 4).

    Pixel (h, w) maps to image coords (w * pad_w / W, h * pad_h / H) — the
    reference samples at index*stride, not pixel centers (`petr_head.py:290-291`).
    The homogeneous point is (u*d, v*d, d, 1) with d clamped below by eps when
    multiplying into uv.
    """
    eps = 1e-5
    coords_h = jnp.arange(feat_h, dtype=jnp.float32) * (pad_h / feat_h)
    coords_w = jnp.arange(feat_w, dtype=jnp.float32) * (pad_w / feat_w)
    d = coords_d.astype(jnp.float32)
    D = d.shape[0]
    u = coords_w[None, :, None]  # (1, W, 1)
    v = coords_h[:, None, None]  # (H, 1, 1)
    dmul = jnp.maximum(d, eps)[None, None, :]  # (1, 1, D)
    uu = jnp.broadcast_to(u * dmul, (feat_h, feat_w, D))
    vv = jnp.broadcast_to(v * dmul, (feat_h, feat_w, D))
    dd = jnp.broadcast_to(d[None, None, :], (feat_h, feat_w, D))
    ones = jnp.ones_like(dd)
    return jnp.stack([uu, vv, dd, ones], axis=-1)


def backproject_frustum(coords: jax.Array, img2lidar: jax.Array) -> jax.Array:
    """Map homogeneous frustum points into the shared LiDAR/world frame.

    Args:
        coords: (H, W, D, 4) homogeneous frustum points.
        img2lidar: (..., 4, 4) inverse lidar2img matrices (leading dims e.g.
            (B, N)).
    Returns:
        (..., H, W, D, 3) world-frame xyz.
    """
    # (..., 1, 1, 1, 4, 4) @ (H, W, D, 4, 1): use einsum over last dim.
    pts = jnp.einsum("...ij,hwdj->...hwdi", img2lidar.astype(jnp.float32), coords)
    return pts[..., :3]


def position_coords_3d(
    feat_h: int,
    feat_w: int,
    pad_h: float,
    pad_w: float,
    img2lidar: jax.Array,
    position_range: Tuple[float, float, float, float, float, float],
    depth_num: int = 64,
    depth_start: float = 1.0,
    depth_mode: str = "LID",
) -> Tuple[jax.Array, jax.Array]:
    """Normalized 3D coords per feature pixel + out-of-range mask.

    Mirrors `petr_head.py:286-331`: back-project the frustum, normalize into
    ``position_range``, and mark a pixel masked when more than half of its
    (D*3) coordinate values fall outside [0, 1].

    Args:
        img2lidar: (B, N, 4, 4).
    Returns:
        coords3d: (B, N, H, W, D*3) fp32, channel layout [d, axis] with d
            outermost (axis fastest) — matches the reference's
            ``permute(0,1,4,5,3,2)`` flatten.
        oob_mask: (B, N, H, W) bool, True = masked (out of range).
    """
    pr = jnp.asarray(position_range, dtype=jnp.float32)
    coords_d = depth_bins(depth_num, depth_start, float(position_range[3]), depth_mode)
    coords = frustum_coords(feat_h, feat_w, pad_h, pad_w, coords_d)  # (H, W, D, 4)
    pts = backproject_frustum(coords, img2lidar)  # (B, N, H, W, D, 3)
    low = pr[0:3]
    span = pr[3:6] - pr[0:3]
    pts = (pts - low) / span
    out = (pts > 1.0) | (pts < 0.0)  # (B, N, H, W, D, 3)
    D = coords_d.shape[0]
    oob_mask = out.reshape(*out.shape[:-2], D * 3).sum(axis=-1) > (D * 0.5)
    coords3d = pts.reshape(*pts.shape[:-2], D * 3)  # [d major, axis minor]
    return coords3d, oob_mask


def sine_posemb_2d_multiview(
    masks: jax.Array,
    num_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = TWO_PI,
    eps: float = 1e-6,
    offset: float = 0.0,
) -> jax.Array:
    """Camera-aware 2D sine positional encoding (SinePositionalEncoding3D).

    Args:
        masks: (B, N, H, W) bool/int; nonzero = padded/ignored position.
    Returns:
        (B, N, H, W, 3*num_feats) fp32, channel order (n, y, x) to match
        `positional_encoding.py:99`; each axis's feats in the reference's
        block order [sins | coss] (see ``_sincos_block``).
    """
    not_mask = 1.0 - masks.astype(jnp.float32)
    n_embed = jnp.cumsum(not_mask, axis=1)
    y_embed = jnp.cumsum(not_mask, axis=2)
    x_embed = jnp.cumsum(not_mask, axis=3)
    if normalize:
        n_embed = (n_embed + offset) / (n_embed[:, -1:, :, :] + eps) * scale
        y_embed = (y_embed + offset) / (y_embed[:, :, -1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, :, :, -1:] + eps) * scale
    pos_n = _sincos_block(n_embed, num_feats, temperature)
    pos_y = _sincos_block(y_embed, num_feats, temperature)
    pos_x = _sincos_block(x_embed, num_feats, temperature)
    return jnp.concatenate([pos_n, pos_y, pos_x], axis=-1)
