"""ResNet backbone (NHWC, frozen BN), caffe-style bottlenecks.

Capability reference: the r50dcn configs of sty61010/PETR use upstream mmdet
ResNet-50 ('caffe' style, frozen stem+stage1, BN eval, DCNv2 in stages 3-4 —
`projects/configs/petr/petr_r50dcn_gridmask_p4.py:31-44`). This is an
independent NHWC/flax implementation; 'caffe' style places the stride on the
first 1x1 conv of a bottleneck (needed so torch checkpoint import is a pure
key-map).

DCNv2 stages are supported via a deformable-conv op (Pallas-backed on TPU;
see petr_tpu/ops/pallas/dcn.py) selected by ``dcn_stages``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from petr_tpu.models.layers import FrozenBatchNorm
from petr_tpu.ops.dcn import deform_conv2d_init_args, modulated_deform_conv

Dtype = Any


class Bottleneck(nn.Module):
    mid: int
    out: int
    stride: int = 1
    style: str = "caffe"  # 'caffe': stride on conv1; 'pytorch': on conv2
    use_dcn: bool = False
    dtype: Dtype = jnp.float32
    bn_mode: str = "frozen"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s1 = self.stride if self.style == "caffe" else 1
        s2 = 1 if self.style == "caffe" else self.stride
        identity = x

        y = nn.Conv(self.mid, (1, 1), strides=(s1, s1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(dtype=self.dtype, use_batch_stats=self.bn_mode == "batch", name="bn1")(y)
        y = nn.relu(y)

        if self.use_dcn:
            # DCNv2: offsets/masks predicted by a small conv, then a
            # deformable 3x3 gather-conv.
            off_mask = nn.Conv(
                27, (3, 3), strides=(s2, s2), padding=[(1, 1), (1, 1)],
                dtype=jnp.float32, name="conv2_offset",
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            )(y.astype(jnp.float32))
            w = self.param(
                "conv2_weight",
                nn.initializers.he_normal(),
                (3, 3, self.mid, self.mid),
                jnp.float32,
            )
            y = modulated_deform_conv(y, off_mask, w, stride=s2)
        else:
            y = nn.Conv(
                self.mid, (3, 3), strides=(s2, s2), padding=[(1, 1), (1, 1)],
                use_bias=False, dtype=self.dtype, name="conv2",
            )(y)
        y = FrozenBatchNorm(dtype=self.dtype, use_batch_stats=self.bn_mode == "batch", name="bn2")(y)
        y = nn.relu(y)

        y = nn.Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(dtype=self.dtype, use_batch_stats=self.bn_mode == "batch", name="bn3")(y)

        if x.shape[-1] != self.out or self.stride != 1:
            identity = nn.Conv(
                self.out, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(dtype=self.dtype, use_batch_stats=self.bn_mode == "batch", name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet with bottleneck blocks; returns the requested stage outputs.

    ``out_indices`` follow mmdet convention: 0..3 for stages C2..C5.
    """

    depth: int = 50
    out_indices: Sequence[int] = (2, 3)
    dcn_stages: Sequence[int] = ()  # e.g. (2, 3) for DCN in C4, C5
    style: str = "caffe"
    remat_stages: bool = True
    dtype: Dtype = jnp.float32
    bn_mode: str = "frozen"

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        blocks_per_stage = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]

        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="stem_conv",
        )(x)
        x = FrozenBatchNorm(dtype=self.dtype, use_batch_stats=self.bn_mode == "batch", name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        mid = 64
        for stage in range(4):
            out_ch = mid * 4
            Block = nn.remat(Bottleneck) if self.remat_stages else Bottleneck
            for b in range(blocks_per_stage[stage]):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = Block(
                    mid,
                    out_ch,
                    stride,
                    self.style,
                    stage in self.dcn_stages,
                    self.dtype,
                    self.bn_mode,
                    name=f"layer{stage + 1}_block{b}",
                )(x)
            if stage in self.out_indices:
                outs.append(x)
            mid *= 2
        return tuple(outs)
