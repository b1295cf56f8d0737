"""CPFPN — FPN whose 3x3 fusion conv exists only on level 0.

Behavioral reference: `models/necks/cp_fpn.py` (sty61010/PETR): 1x1 lateral
convs on every input level, top-down nearest-neighbor upsample + add, and a
3x3 fpn conv on level 0 only (so checkpointed backbones have no unused
params under DDP — a torch-ism, but the resulting architecture is what the
released checkpoints use, so we reproduce it).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def upsample_nearest(x: jax.Array, target_hw: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize to target (H, W) (channels-last)."""
    H, W = target_hw
    return jax.image.resize(x, (*x.shape[:-3], H, W, x.shape[-1]), method="nearest")


class CPFPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]) -> Tuple[jax.Array, ...]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}")(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + upsample_nearest(
                laterals[i], laterals[i - 1].shape[-3:-1]
            )
        outs = [
            nn.Conv(
                self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                dtype=self.dtype, name="fpn_conv0",
            )(laterals[0])
        ] + laterals[1:]
        # extra levels by stride-2 1x1 maxpool (reference cp_fpn.py:193-196)
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs[: self.num_outs])
