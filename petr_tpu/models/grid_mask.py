"""GridMask augmentation, fully on-device (no host PIL/NumPy RNG).

Behavioral reference: `models/utils/grid_mask.py` (sty61010/PETR) as invoked
by the detector (`petr3d.py:65,86-87`): use_h=use_w=True, mode=1 (the grid
BANDS are the kept pixels), ratio=0.5, prob 0.7, integer period
d ~ randint[2, h), band length l = min(max(int(d*ratio+0.5), 1), d-1),
offsets st ~ randint[0, d), built on a 1.5x canvas and center-cropped. The
reference passes ``rotate=1`` => ``np.random.randint(1) == 0`` — the mask is
NEVER rotated in the shipped recipe.

Default mode (``exact=True``) matches the reference bit-for-bit in
distribution: ONE integer-parameter mask per forward call, broadcast over
every (batch, view) image — the reference samples once per call of the
stacked (B*N, C, H, W) tensor — and one Bernoulli(prob) gate per call.
Instead of rasterizing bands on a host canvas, band membership is evaluated
analytically per pixel on the VPU (same zero set: a canvas coordinate yc is
banded iff 0 <= yc - st, (yc - st) mod d < l, and (yc - st) // d < hh // d).

``exact=False`` keeps the round-1 variant: per-SAMPLE masks with float
periods and optional analytic rotation — a strictly stronger augmentation of
the same family, useful off the reference recipe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _band(coord: jax.Array, canvas_len: int, crop_off: int, st, d, l) -> jax.Array:
    """Reference band membership for cropped-window coordinates.

    Mirrors the rasterization loop `grid_mask.py:96-105`: bands start at
    ``d*i + st`` for i in range(canvas_len // d), each ``l`` long (truncation
    at the canvas edge is implied by coord < canvas_len)."""
    u = coord + crop_off - st
    return (u >= 0) & (u % d < l) & (u // d < canvas_len // d)


def exact_mask(H: int, W: int, d, st_h, st_w, *, ratio: float = 0.5, mode: int = 1):
    """The reference mask for given integer (d, st_h, st_w) — (H, W) float."""
    d = jnp.asarray(d, jnp.int32)
    l = jnp.clip(jnp.int32(jnp.floor(d * ratio + 0.5)), 1, d - 1)
    hh, ww = int(1.5 * H), int(1.5 * W)
    row = _band(jnp.arange(H, dtype=jnp.int32)[:, None], hh, (hh - H) // 2, st_h, d, l)
    col = _band(jnp.arange(W, dtype=jnp.int32)[None, :], ww, (ww - W) // 2, st_w, d, l)
    banded = row | col
    keep = banded if mode == 1 else ~banded
    return keep.astype(jnp.float32)


def grid_mask(
    rng: jax.Array,
    images: jax.Array,  # (B, N, H, W, C)
    *,
    prob: float = 0.7,
    ratio: float = 0.5,
    mode: int = 1,
    exact: bool = True,
    max_angle_deg: float = 0.0,
) -> jax.Array:
    B, N, H, W, _ = images.shape
    k_apply, k_d, k_off, k_ang = jax.random.split(rng, 4)

    if exact:
        # reference-exact: one integer-parameter mask per call, one gate
        apply = jax.random.uniform(k_apply, ()) < prob
        d = jax.random.randint(k_d, (), 2, H)
        st = jax.random.randint(k_off, (2,), 0, jnp.maximum(d, 1))
        mask = exact_mask(H, W, d, st[0], st[1], ratio=ratio, mode=mode)
        mask = jnp.where(apply, mask, 1.0)
        return images * mask[None, None, :, :, None].astype(images.dtype)

    apply = jax.random.uniform(k_apply, (B,)) < prob
    d = jax.random.uniform(k_d, (B,), minval=2.0, maxval=float(H))
    keep_len = jnp.maximum(jnp.minimum(jnp.round(d * ratio), d - 1.0), 1.0)
    off = jax.random.uniform(k_off, (B, 2)) * d[:, None]
    ang = jax.random.uniform(k_ang, (B,), minval=0.0, maxval=max_angle_deg) * (
        jnp.pi / 180.0
    )

    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]

    def one_mask(d_i, keep_i, off_i, ang_i):
        # rotate pixel coords about the image center
        cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
        c, s = jnp.cos(ang_i), jnp.sin(ang_i)
        ry = (yy - cy) * c - (xx - cx) * s + cy
        rx = (yy - cy) * s + (xx - cx) * c + cx
        my = jnp.mod(ry + off_i[0], d_i) < keep_i
        mx = jnp.mod(rx + off_i[1], d_i) < keep_i
        # zero where BOTH coords fall outside their kept band (the same
        # ~(1-ratio)^2 zero fraction as the reference's mode=1 OR-keep)
        return 1.0 - (my & mx).astype(jnp.float32)

    masks = jax.vmap(one_mask)(d, keep_len, off, ang)  # (B, H, W)
    masks = jnp.where(apply[:, None, None], masks, 1.0)
    return images * masks[:, None, :, :, None].astype(images.dtype)
