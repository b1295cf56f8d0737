"""Bilinear sampling (grid-sample) in pure XLA gathers.

Replaces torch ``F.grid_sample`` uses in the reference (DETR3D feature
sampling `models/utils/detr3d_transformer.py:425`, depth encoder interp).
Zero-padding outside, align_corners=False pixel convention unless noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(feat: jax.Array, xy: jax.Array) -> jax.Array:
    """Sample ``feat`` at fractional pixel locations.

    Args:
        feat: (H, W, C).
        xy: (..., 2) pixel coordinates (x, y) where (0, 0) is the center of
            the top-left pixel. Out-of-bounds reads return 0.
    Returns:
        (..., C) samples.
    """
    H, W, C = feat.shape
    x = xy[..., 0].astype(jnp.float32)
    y = xy[..., 1].astype(jnp.float32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = feat.reshape(H * W, C)
        v = flat[yi_c * W + xi_c]
        return jnp.where(inb[..., None], v, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def grid_sample_normalized(feat: jax.Array, grid: jax.Array, align_corners: bool = False) -> jax.Array:
    """torch-style grid_sample with coords in [-1, 1].

    Args:
        feat: (H, W, C); grid: (..., 2) normalized (x, y).
    """
    H, W, _ = feat.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) * 0.5
        y = ((gy + 1.0) * H - 1.0) * 0.5
    return bilinear_sample(feat, jnp.stack([x, y], axis=-1))
