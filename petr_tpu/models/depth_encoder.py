"""Depth-map utilities + GT-depth encoder (the Depthr research branch).

Behavioral references (sty61010/PETR fork):
  * `models/utils/depth_utils.py` — LID/UD/SID depth binning with an
    overflow bin at index D (out-of-range / non-finite depths).
  * `models/necks/depth_gt_encoder.py` — one-hot GT depth maps -> strided
    conv stack (GroupNorm 32) downscaling by `down_scale`, plus a learned
    1D-interpolated depth positional embedding added from the
    probability-weighted metric depth.
  * `models/dense_heads/depthr_head.py:560-718` — GT depth-map painting:
    project box corners per camera, visibility filter, 2D bbox fill far->
    near (nearest covering box wins). Re-designed here as a vectorized
    min-depth-over-covering-boxes (equivalent to the sequential painter) so
    it runs on device with static shapes.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from petr_tpu.ops.boxes import box_corners

Dtype = Any


def bin_depth_indices(
    depth: jax.Array,
    mode: str = "LID",
    depth_min: float = 1e-3,
    depth_max: float = 60.0,
    num_bins: int = 80,
) -> jax.Array:
    """Metric depth -> bin index; out-of-range/non-finite -> num_bins."""
    d = depth.astype(jnp.float32)
    if mode == "UD":
        idx = (d - depth_min) / ((depth_max - depth_min) / num_bins)
    elif mode == "LID":
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        idx = -0.5 + 0.5 * jnp.sqrt(1 + 8 * (d - depth_min) / bin_size)
    elif mode == "SID":
        idx = (
            num_bins
            * (jnp.log(1 + d) - math.log(1 + depth_min))
            / (math.log(1 + depth_max) - math.log(1 + depth_min))
        )
    else:
        raise ValueError(mode)
    bad = (idx < 0) | (idx > num_bins) | ~jnp.isfinite(idx)
    return jnp.where(bad, num_bins, idx).astype(jnp.int32)


def lid_bin_values(num_bins: int, depth_min: float, depth_max: float) -> jax.Array:
    """Bin-center metric values + overflow value (depth_gt_encoder.py:44-48)."""
    bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
    idx = jnp.arange(num_bins, dtype=jnp.float32)
    centers = (idx + 0.5) ** 2 * bin_size / 2 - bin_size / 8 + depth_min
    return jnp.concatenate([centers, jnp.asarray([depth_max], jnp.float32)])


def gt_depth_maps(
    gt_boxes: jax.Array,  # (B, G, 9) gravity-center
    gt_valid: jax.Array,  # (B, G)
    lidar2img: jax.Array,  # (B, N, 4, 4)
    img_hw: Tuple[int, int],
    down_scale: int = 8,
) -> jax.Array:
    """Per-camera GT depth maps at 1/down_scale resolution, (B, N, h, w).

    A pixel takes the center depth of the nearest GT box whose projected
    2D bbox covers it (== the reference's far-to-near painter fill).
    """
    img_h, img_w = img_hw
    h, w = img_h // down_scale, img_w // down_scale
    corners = box_corners(gt_boxes)  # (B, G, 8, 3)
    ones = jnp.ones((*corners.shape[:-1], 1), corners.dtype)
    hom = jnp.concatenate([corners, ones], -1)  # (B, G, 8, 4)
    uvd = jnp.einsum("bnij,bgkj->bngki", lidar2img[:, :, :3], hom)  # (B,N,G,8,3)
    centers_hom = jnp.concatenate([gt_boxes[..., :3], ones[..., 0:1, 0:1][..., 0]], -1)
    cdepth = jnp.einsum("bnij,bgj->bngi", lidar2img[:, :, :3], centers_hom)[..., 2]

    depth_c = uvd[..., 2]
    uv = uvd[..., :2] / (uvd[..., 2:3] + 1e-8)

    visible = (
        (uv[..., 0] > 0) & (uv[..., 0] < img_w) & (uv[..., 1] > 0) & (uv[..., 1] < img_h)
        & (depth_c > 1.0)
    )
    in_front = depth_c > 0.1
    keep = visible.any(-1) & in_front.all(-1) & gt_valid[:, None, :]  # (B, N, G)

    uv = uv / down_scale
    u = jnp.clip(uv[..., 0], 0, w)
    v = jnp.clip(uv[..., 1], 0, h)
    # int truncation like the reference's .int() on (min, max) then w,h fill
    x0 = jnp.floor(u.min(-1)).astype(jnp.int32)
    y0 = jnp.floor(v.min(-1)).astype(jnp.int32)
    x1 = jnp.floor(u.max(-1)).astype(jnp.int32)
    y1 = jnp.floor(v.max(-1)).astype(jnp.int32)

    xs = jnp.arange(w)
    ysr = jnp.arange(h)
    cov_x = (xs[None, None, None, :] >= x0[..., None]) & (xs[None, None, None, :] < x1[..., None])
    cov_y = (ysr[None, None, None, :] >= y0[..., None]) & (ysr[None, None, None, :] < y1[..., None])
    covered = cov_y[..., :, None] & cov_x[..., None, :]  # (B, N, G, h, w)
    covered &= keep[..., None, None]

    big = 1e9
    depth_per_box = jnp.where(keep, cdepth, big)[..., None, None]
    depth_map = jnp.where(covered, depth_per_box, big).min(axis=2)  # (B, N, h, w)
    return jnp.where(depth_map >= big, 0.0, depth_map)


class DepthGTEncoder(nn.Module):
    """One-hot depth maps -> depth tokens + interpolated depth PE."""

    num_bins: int = 80
    depth_min: float = 1e-3
    depth_max: float = 60.0
    embed_dim: int = 256
    down_scale: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, depth_onehot: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Args: depth_onehot (B, N, h, w, D+1).

        Returns (depth_embed (B, N, h', w', C), weighted_depth (B, N, h', w'))
        with h' = h / down_scale.
        """
        B, N, h, w, D1 = depth_onehot.shape
        x = depth_onehot.reshape(B * N, h, w, D1).astype(self.dtype)
        n_layers = 1 + int(math.log2(self.down_scale) - 1)
        for i in range(n_layers):
            x = nn.Conv(
                self.embed_dim, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            # epsilon matches torch GroupNorm (flax defaults to 1e-6)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name=f"gn{i}")(x)
            x = nn.relu(x)

        # weighted metric depth at the downscaled resolution
        bins = lid_bin_values(self.num_bins, self.depth_min, self.depth_max)
        probs = depth_onehot.astype(jnp.float32)
        stride = self.down_scale
        probs_ds = probs[:, :, ::stride, ::stride, :]  # nearest downsample
        weighted = (probs_ds * bins).sum(-1)  # (B, N, h', w')

        # learned 1D depth embedding, linearly interpolated at metric depth
        emb = self.param(
            "depth_pos_embed",
            nn.initializers.normal(1.0),
            (int(self.depth_max) + 1, self.embed_dim),
            jnp.float32,
        )
        dclamp = jnp.clip(weighted, 0.0, self.depth_max)
        lo = jnp.floor(dclamp)
        delta = (dclamp - lo)[..., None]
        lo_i = lo.astype(jnp.int32)
        hi_i = jnp.minimum(lo_i + 1, emb.shape[0] - 1)
        pe = emb[lo_i] * (1 - delta) + emb[hi_i] * delta  # (B, N, h', w', C)

        hp, wp = x.shape[1:3]
        depth_embed = x.reshape(B, N, hp, wp, self.embed_dim) + pe.astype(self.dtype)
        return depth_embed, weighted
