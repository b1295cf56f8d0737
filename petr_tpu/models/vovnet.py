"""VoVNetV2 backbone (OSA modules + eSE), NHWC, frozen BN.

Capability reference: `models/backbones/vovnet.py` / `vovnetcp.py`
(sty61010/PETR). Spec table reproduced for V-99-eSE (the flagship backbone):
stem [64, 64, 128], per-stage conv channels [128, 160, 192, 224], concat
(output) channels [256, 512, 768, 1024], 5 convs per OSA block, blocks per
stage [1, 3, 9, 3] (`vovnet.py:79-87`). eSE = global-avg-pool -> 1x1 conv ->
hard-sigmoid channel gate (`vovnet.py:173-185`); identity skip on every block
after the first of a stage. Per-OSA-block remat mirrors VoVNetCP's
``torch.utils.checkpoint`` (`vovnetcp.py:244-245`).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from petr_tpu.models.layers import ConvBNReLU

Dtype = Any

SPECS: Dict[str, Dict] = {
    "V-99-eSE": {
        "stem": (64, 64, 128),
        "stage_conv_ch": (128, 160, 192, 224),
        "stage_out_ch": (256, 512, 768, 1024),
        "layer_per_block": 5,
        "block_per_stage": (1, 3, 9, 3),
        "eSE": True,
    },
    "V-39-eSE": {
        "stem": (64, 64, 128),
        "stage_conv_ch": (128, 160, 192, 224),
        "stage_out_ch": (256, 512, 768, 1024),
        "layer_per_block": 5,
        "block_per_stage": (1, 1, 2, 2),
        "eSE": True,
    },
    "V-57-eSE": {
        "stem": (64, 64, 128),
        "stage_conv_ch": (128, 160, 192, 224),
        "stage_out_ch": (256, 512, 768, 1024),
        "layer_per_block": 5,
        "block_per_stage": (1, 1, 4, 3),
        "eSE": True,
    },
}


def hsigmoid(x: jax.Array) -> jax.Array:
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class ESE(nn.Module):
    """Effective squeeze-excite: hsigmoid(conv1x1(avgpool)) channel gate."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = x.mean(axis=(-3, -2), keepdims=True)
        g = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc")(g)
        return x * hsigmoid(g)


class OSABlock(nn.Module):
    """One-shot aggregation: k sequential 3x3 convs, concat all, 1x1 project,
    eSE gate, optional identity."""

    stage_ch: int
    concat_ch: int
    layer_per_block: int
    identity: bool = False
    use_ese: bool = True
    dtype: Dtype = jnp.float32
    quant: str = "none"
    bn_mode: str = "frozen"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        feats = [x]
        y = x
        for i in range(self.layer_per_block):
            y = ConvBNReLU(
                self.stage_ch, 3, dtype=self.dtype, quant=self.quant,
                bn_mode=self.bn_mode, name=f"conv{i}"
            )(y)
            feats.append(y)
        y = jnp.concatenate(feats, axis=-1)
        y = ConvBNReLU(
            self.concat_ch, 1, dtype=self.dtype, quant=self.quant,
            bn_mode=self.bn_mode, name="concat"
        )(y)
        if self.use_ese:
            y = ESE(self.concat_ch, dtype=self.dtype, name="ese")(y)
        if self.identity:
            y = y + x
        return y


class VoVNet(nn.Module):
    """VoVNetV2; returns features for ``out_indices`` (0..3 = stage2..stage5,
    strides 4/8/16/32)."""

    spec: str = "V-99-eSE"
    out_indices: Sequence[int] = (2, 3)
    remat: bool = True
    dtype: Dtype = jnp.float32
    quant: str = "none"
    bn_mode: str = "frozen"

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        spec = SPECS[self.spec]
        s0, s1, s2 = spec["stem"]
        x = ConvBNReLU(s0, 3, 2, dtype=self.dtype, quant=self.quant, bn_mode=self.bn_mode, name="stem1")(x)
        x = ConvBNReLU(s1, 3, 1, dtype=self.dtype, quant=self.quant, bn_mode=self.bn_mode, name="stem2")(x)
        x = ConvBNReLU(s2, 3, 2, dtype=self.dtype, quant=self.quant, bn_mode=self.bn_mode, name="stem3")(x)

        Block = nn.remat(OSABlock) if self.remat else OSABlock
        outs = []
        for stage in range(4):
            if stage > 0:
                # ceil-mode 3x3/2 maxpool (reference `vovnet.py:243`)
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
            for b in range(spec["block_per_stage"][stage]):
                x = Block(
                    spec["stage_conv_ch"][stage],
                    spec["stage_out_ch"][stage],
                    spec["layer_per_block"],
                    b > 0,  # identity on non-first blocks
                    spec["eSE"],
                    self.dtype,
                    self.quant,
                    self.bn_mode,
                    name=f"stage{stage + 2}_block{b}",
                )(x)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)
