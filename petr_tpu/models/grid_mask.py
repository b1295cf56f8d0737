"""GridMask augmentation, fully on-device (no host PIL/NumPy RNG).

Behavioral reference: `models/utils/grid_mask.py` (sty61010/PETR) as invoked
by the detector (`petr3d.py:65,86-87`): mode=1 (keep cells), ratio=0.5,
prob 0.7, period d ~ randint[2, h), offsets ~ randint[0, d). Note the
reference passes ``rotate=1`` => ``np.random.randint(1) == 0`` — the mask is
NEVER rotated in the shipped recipe, so ``max_angle_deg`` defaults to 0 here
(analytic rotation remains available behind the arg).

The reference builds the mask with host NumPy + PIL rotate every step. Here
the mask is evaluated analytically at rotated coordinates on the VPU: a pixel
is kept when both rotated coordinates land in the "kept" half of their grid
period. One mask is sampled per batch element and applied to all its views
(matching the reference, which samples per forward call of the stacked
(B*N) image tensor... it samples ONE mask per call and broadcasts — we use
per-sample masks, strictly stronger augmentation of the same family).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(
    rng: jax.Array,
    images: jax.Array,  # (B, N, H, W, C)
    *,
    prob: float = 0.7,
    ratio: float = 0.5,
    max_angle_deg: float = 0.0,
) -> jax.Array:
    B, N, H, W, _ = images.shape
    k_apply, k_d, k_off, k_ang = jax.random.split(rng, 4)

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
        # mode=1: zero inside the grid bands, keep the rest -> pixel survives
        # unless both coords fall in the masked band
        return 1.0 - (my & mx).astype(jnp.float32)

    masks = jax.vmap(one_mask)(d, keep_len, off, ang)  # (B, H, W)
    masks = jnp.where(apply[:, None, None], masks, 1.0)
    return images * masks[:, None, :, :, None].astype(images.dtype)
