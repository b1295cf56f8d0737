"""Shared NN building blocks (flax.linen, NHWC, bf16-aware).

Conventions:
  * params are stored fp32; ``dtype`` controls compute precision.
  * convs operate on channels-last tensors (TPU-native layout).
  * FrozenBatchNorm carries running stats as constants-in-params — the
    reference trains every config with BN in eval mode (norm_eval /
    requires_grad=False; `vovnet.py:374-383`, configs), so BN is always an
    affine transform with frozen statistics.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch nn.Linear / nn.Conv2d default kernel init: kaiming_uniform(a=sqrt(5))
# == U(+-1/sqrt(fan_in)) == variance 1/(3*fan_in). The reference trains its
# heads from scratch with these defaults (only the transformer gets the DETR
# xavier pass and the cls bias its focal prior), so initialization parity
# matters for training-recipe fidelity.
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# DETR xavier pass (`petr_transformer.py:62-67`): xavier_uniform, bias 0.
xavier_uniform = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
# torch nn.MultiheadAttention packs q/k/v as one (3C, C) matrix and
# xavier-uniforms it -> bound sqrt(6/(C+3C)); emulated per-projection.
packed_qkv_init = nn.initializers.variance_scaling(0.5, "fan_avg", "uniform")


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """Dense with torch nn.Linear's DEFAULT initialization (kernel
    kaiming_uniform(a=sqrt(5)), bias U(+-1/sqrt(fan_in))). Param layout is
    identical to nn.Dense (kernel (in, out), bias (out,)) so checkpoints and
    the torch importer are unaffected. ``bias_init`` overrides the bias
    (e.g. the focal-prior constant of the final cls layer)."""

    features: int
    dtype: Dtype = jnp.float32
    bias_init: Optional[Callable] = None
    kernel_init: Optional[Callable] = None  # e.g. xavier_uniform where a
    #                                         per-PARAMETER xavier pass runs
    #                                         (Detr3D) but biases keep torch
    #                                         defaults

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init or torch_kernel_init,
            (fan_in, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", self.bias_init or _torch_bias_init(fan_in), (self.features,),
            jnp.float32,
        )
        return x.astype(self.dtype) @ kernel.astype(self.dtype) + bias.astype(self.dtype)


class FrozenBatchNorm(nn.Module):
    """BatchNorm evaluated with frozen running statistics.

    ``scale``/``bias`` are trainable; ``mean``/``var`` are parameters that the
    optimizer must mask out (see train/optim.py) — kept in the param tree so
    torch-checkpoint import is a pure key-map.
    """

    dtype: Dtype = jnp.float32
    eps: float = 1e-5
    # True = normalize with the CURRENT batch's moments (mmcv
    # norm_eval=False train mode; from-scratch training). The stored
    # mean/var params remain in the tree (checkpoint/torch-import parity)
    # but are unused in that mode.
    use_batch_stats: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        if self.use_batch_stats:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = xf.mean(axis=axes)
            var = xf.var(axis=axes)
            # surface the batch moments so the train step can EMA them into
            # the stored mean/var params (mmcv norm_eval=False semantics:
            # batch moments in forward, running averages tracked for eval —
            # eval-time models are built with bn_mode="frozen" and read the
            # EMA'd params, keeping eval per-sample independent and the
            # streaming feature cache exact)
            if self.is_initializing() or self.is_mutable_collection("batch_stats"):
                mv = self.variable("batch_stats", "mean", lambda: jnp.zeros(c))
                vv = self.variable("batch_stats", "var", lambda: jnp.ones(c))
                if not self.is_initializing():
                    mv.value = mean
                    # torch BN tracks the UNBIASED (Bessel-corrected)
                    # variance in running_var while normalizing with the
                    # biased one — mirror both sides exactly
                    n = 1
                    for a in axes:
                        n *= x.shape[a]
                    vv.value = var * (n / max(n - 1, 1))
        # Fold into a single scale/shift (XLA fuses this into the conv).
        mul = scale * jax.lax.rsqrt(var + self.eps)
        add = bias - mean * mul
        return (x * mul.astype(self.dtype) + add.astype(self.dtype)).astype(self.dtype)


class _ConvKernel(nn.Module):
    """Param holder producing the same tree as ``nn.Conv`` (conv/kernel)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32)


class _BNParams(nn.Module):
    """Param holder matching ``FrozenBatchNorm`` (bn/{scale,bias,mean,var})."""

    channels: int

    @nn.compact
    def __call__(self):
        c = self.channels
        return (
            self.param("scale", nn.initializers.ones, (c,), jnp.float32),
            self.param("bias", nn.initializers.zeros, (c,), jnp.float32),
            self.param("mean", nn.initializers.zeros, (c,), jnp.float32),
            self.param("var", nn.initializers.ones, (c,), jnp.float32),
        )


class ConvBNReLU(nn.Module):
    """3x3/1x1 conv + frozen BN + optional ReLU (the backbone workhorse).

    PETR_TPU_CONV_IMPL=pallas routes supported 3x3/stride-1 shapes through
    the fused im2col Pallas kernel (`ops/pallas/conv3x3.py`, BN scale/shift +
    ReLU in the GEMM epilogue). Measured on the V-99 backbone (6x320x800):
    XLA 15.8 ms vs Pallas 16.4 ms — XLA's conv emitter + fusion wins
    in-graph, so the default stays XLA; the kernel remains as an explicit
    option and a base for shapes where XLA regresses. The parameter tree
    (conv/kernel + bn/{scale,bias,mean,var}) is identical on both paths, so
    checkpoints and the torch importer are unaffected.

    Post-training int8 quantization (serving): ``quant`` selects
      * "none"  — normal bf16/f32 path.
      * "calib" — normal numerics, additionally records the running max-abs
                  of the conv input in the "quant" collection
                  (apply with ``mutable=["quant"]``; see petr_tpu/quant).
      * "int8"  — symmetric per-output-channel weight quant (BN scale folded
                  into the weight first) x per-tensor activation quant from
                  the calibrated amax; int8 conv with int32 accumulation on
                  the MXU, dequant + BN shift + ReLU in the epilogue.
    The param tree is identical in all modes; scales live in the separate
    "quant" collection so checkpoints are unaffected.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    groups: int = 1
    dtype: Dtype = jnp.float32
    eps: float = 1e-5
    quant: str = "none"
    bn_mode: str = "frozen"  # "frozen" | "batch" (see BackboneConfig.bn_mode)

    def _use_pallas(self, x_shape) -> bool:
        import os

        from petr_tpu.ops.pallas.conv3x3 import conv3x3_supported

        if os.environ.get("PETR_TPU_CONV_IMPL", "xla") != "pallas":
            return False
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        interp = jax.default_backend() == "cpu"  # tests force interpret mode
        return (
            (on_tpu or interp)
            and self.kernel == 3
            and conv3x3_supported(tuple(x_shape), self.stride, self.groups)
        )

    def _int8_forward(self, x: jax.Array, amax: jax.Array) -> jax.Array:
        w = _ConvKernel(
            (self.kernel, self.kernel, x.shape[-1] // self.groups, self.features),
            name="conv",
        )()
        scale, bias, mean, var = _BNParams(self.features, name="bn")()
        mul = scale * jax.lax.rsqrt(var + self.eps)
        add = bias - mean * mul
        wf = w * mul  # fold BN scale into the kernel (per output channel)
        sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-12) / 127.0
        wi = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
        sa = jnp.maximum(amax, 1e-6) / 127.0
        xi = jnp.clip(jnp.round(x.astype(jnp.float32) / sa), -127.0, 127.0).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xi,
            wi,
            (self.stride, self.stride),
            [(self.kernel // 2, self.kernel // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (sa * sw) + add
        if self.relu:
            y = jnp.maximum(y, 0.0)
        return y.astype(self.dtype)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.bn_mode == "batch" and self.quant != "none":
            raise ValueError("int8 PTQ requires frozen BN (serving path)")
        if self.quant in ("calib", "int8"):
            amax = self.variable(
                "quant", "act_amax", lambda: jnp.zeros((), jnp.float32)
            )
            if self.quant == "int8":
                return self._int8_forward(x, amax.value)
            if not self.is_initializing():
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x)).astype(jnp.float32)
                )
        if self._use_pallas(x.shape) and self.bn_mode == "frozen":
            from petr_tpu.ops.pallas.conv3x3 import conv3x3_bn_relu

            w = _ConvKernel((3, 3, x.shape[-1], self.features), name="conv")()
            scale, bias, mean, var = _BNParams(self.features, name="bn")()
            mul = scale * jax.lax.rsqrt(var + self.eps)
            add = bias - mean * mul
            return conv3x3_bn_relu(
                x.astype(self.dtype), w.astype(self.dtype), mul, add, self.relu
            )
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            use_bias=False,
            feature_group_count=self.groups,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = FrozenBatchNorm(
            dtype=self.dtype, eps=self.eps,
            use_batch_stats=self.bn_mode == "batch", name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class MLP(nn.Module):
    """Linear stack with an activation between layers (no final act)."""

    features: Sequence[int]
    activation: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, f in enumerate(self.features):
            x = TorchLinear(f, dtype=self.dtype, name=f"fc{i}")(x)
            if i < len(self.features) - 1:
                x = self.activation(x)
        return x


class MultiheadAttention(nn.Module):
    """Batch-first multi-head attention with additive positional embeddings.

    Equivalent computation to torch ``nn.MultiheadAttention`` + the reference
    wrapper (`petr_transformer.py:227-367`): query/key PE added before the
    projections, residual identity added by the caller. fp32 softmax.
    """

    embed_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    use_flash: bool = False  # Pallas online-softmax kernel (no attn dropout)

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, Q, C)
        key: jax.Array,  # (B, L, C)
        value: jax.Array,  # (B, L, C)
        *,
        key_padding_mask: Optional[jax.Array] = None,  # (B, L) True = pad
        deterministic: bool = True,
    ) -> jax.Array:
        H = self.num_heads
        D = self.embed_dim // H

        # torch MHA init parity: packed-xavier in_proj (bound sqrt(6/4C)),
        # zero biases; out_proj gets the DETR xavier pass.
        def proj(name):
            return nn.Dense(
                self.embed_dim, dtype=self.dtype, kernel_init=packed_qkv_init,
                name=name,
            )

        q = proj("q_proj")(query)
        k = proj("k_proj")(key)
        v = proj("v_proj")(value)
        B, Q, _ = q.shape
        L = k.shape[1]
        q = q.reshape(B, Q, H, D)
        k = k.reshape(B, L, H, D)
        v = v.reshape(B, L, H, D)

        # The Pallas path streams K/V through VMEM (no (Q, L) logits in HBM)
        # and has a custom flash VJP with in-kernel attention-prob dropout
        # (counter-based mask regenerated in backward), so it serves training
        # (reference recipe's 0.1 attn dropout) and inference alike.
        if self.use_flash:
            from petr_tpu.ops.pallas.cross_attention import flash_cross_attention

            rate = 0.0 if deterministic else float(self.dropout_rate)
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32,
                )
            out = flash_cross_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                key_padding_mask,
                128, 512, False, rate, seed,
            ).transpose(0, 2, 1, 3)
        else:
            scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
            logits = jnp.einsum("bqhd,blhd->bhql", q, k).astype(jnp.float32) * scale
            if key_padding_mask is not None:
                neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
                logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
            attn = jax.nn.softmax(logits, axis=-1)
            attn = nn.Dropout(self.dropout_rate, deterministic=deterministic)(attn)
            out = jnp.einsum("bhql,blhd->bqhd", attn.astype(self.dtype), v)
        out = out.reshape(B, Q, self.embed_dim)
        return nn.Dense(
            self.embed_dim, dtype=self.dtype, kernel_init=xavier_uniform,
            name="out_proj",
        )(out)


class FFN(nn.Module):
    """Transformer feed-forward block (no residual; caller adds it)."""

    hidden_dim: int
    embed_dim: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    # PETR's module-based xavier_init zeroes FFN biases; Detr3D's
    # per-PARAMETER xavier pass (detr3d_transformer.py:73-77) skips biases,
    # leaving torch uniform defaults — set torch_bias=True there.
    torch_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        def binit(fan_in):
            return _torch_bias_init(fan_in) if self.torch_bias else nn.initializers.zeros

        y = nn.Dense(
            self.hidden_dim, dtype=self.dtype, kernel_init=xavier_uniform,
            bias_init=binit(x.shape[-1]), name="fc1",
        )(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate, deterministic=deterministic)(y)
        y = nn.Dense(
            self.embed_dim, dtype=self.dtype, kernel_init=xavier_uniform,
            bias_init=binit(self.hidden_dim), name="fc2",
        )(y)
        y = nn.Dropout(self.dropout_rate, deterministic=deterministic)(y)
        return y


class SELayer(nn.Module):
    """Squeeze-excite gate used by PETRv2's feature-guided PE
    (`petrv2_head.py:48-60`): x * sigmoid(conv(relu(conv(se_input))))."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, gate_input: jax.Array) -> jax.Array:
        # torch Conv2d default init (kaiming a=sqrt(5) + uniform bias)
        def conv(name, fan_in):
            return nn.Conv(
                self.channels, (1, 1), dtype=self.dtype,
                kernel_init=torch_kernel_init, bias_init=_torch_bias_init(fan_in),
                name=name,
            )

        g = conv("conv_reduce", gate_input.shape[-1])(gate_input)
        g = nn.relu(g)
        g = conv("conv_expand", self.channels)(g)
        return x * jax.nn.sigmoid(g)
