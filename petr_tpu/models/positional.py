"""Learned positional encoding variant + re-exports of the sine encodings.

Behavioral reference: `models/utils/positional_encoding.py:113-167`
(sty61010/PETR) — LearnedPositionalEncoding3D: separate row/col/camera
embedding tables combined per position. Registered but unused by shipped
configs; provided for capability parity.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from petr_tpu.ops.geometry import sine_posemb_2d_multiview  # noqa: F401 (re-export)

Dtype = Any


class LearnedPositionalEncoding3D(nn.Module):
    """Row/col/camera learned embeddings -> (B, N, H, W, 3*num_feats)."""

    num_feats: int = 128
    row_num_embed: int = 50
    col_num_embed: int = 50
    cam_num_embed: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, masks: jax.Array) -> jax.Array:
        B, N, H, W = masks.shape
        row = self.param(
            "row_embed", nn.initializers.uniform(1.0), (self.row_num_embed, self.num_feats),
            jnp.float32,
        )
        col = self.param(
            "col_embed", nn.initializers.uniform(1.0), (self.col_num_embed, self.num_feats),
            jnp.float32,
        )
        cam = self.param(
            "cam_embed", nn.initializers.uniform(1.0), (self.cam_num_embed, self.num_feats),
            jnp.float32,
        )
        ce = cam[:N][None, :, None, None, :]  # (1, N, 1, 1, F)
        ye = row[:H][None, None, :, None, :]
        xe = col[:W][None, None, None, :, :]
        shape = (B, N, H, W, self.num_feats)
        return jnp.concatenate(
            [
                jnp.broadcast_to(ce, shape),
                jnp.broadcast_to(ye, shape),
                jnp.broadcast_to(xe, shape),
            ],
            axis=-1,
        ).astype(self.dtype)
