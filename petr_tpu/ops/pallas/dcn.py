"""Pallas DCNv2 (modulated deformable conv) forward kernel.

Replaces the XLA gather formulation of `petr_tpu.ops.dcn` on the hot path
(reference CUDA kernel: mmcv ``modulated_deform_conv`` used by the r50dcn
backbones, `petr_r50dcn_gridmask_p4.py:41-42`).

Design (TPU-first): one grid step owns a tile of output pixels for one
image. The whole input plane lives in VMEM (DCN runs at strides 16/32 where
a plane is <=1.5 MB bf16). For each of the K=9 taps the kernel assembles the
bilinearly-interpolated, mask-modulated patch rows and accumulates the
contraction with that tap's weight slice on the MXU.

Two in-kernel sampling strategies:
  * ``onehot``  — the production path: build the dense bilinear interpolation
    matrix S (tile, H*W) on the VPU via broadcasted iota and contract S @ X
    on the MXU. More FLOPs than a gather, but they ride the MXU: measured
    4.2x the XLA gather formulation at the r50dcn res4 shape (2.6 ms vs
    11.0 ms for 6 views) and 2.8x at res5.
  * ``gather``  — 4 corner row-gathers per tap (near-native FLOPs). Correct
    under the Pallas interpreter, but current Mosaic cannot lower this
    take_along_axis pattern; kept for when dynamic-gather support lands.

Training uses `jax.custom_vjp`: forward = this kernel, backward = the VJP of
the (mathematically identical) XLA formulation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P_TILE = 256  # output pixels per grid step


def _sample_coords(off_mask, H, W, Ho, Wo, stride, dilation, kh, kw):
    """Per-pixel fp32 sample coords + modulation. Returns (sy, sx, m), each
    (B, Ho*Wo, K)."""
    B = off_mask.shape[0]
    K = kh * kw
    off = off_mask[..., : 2 * K].astype(jnp.float32).reshape(B, Ho, Wo, K, 2)
    dy, dx = off[..., 0], off[..., 1]
    m = jax.nn.sigmoid(off_mask[..., 2 * K :].astype(jnp.float32))
    pad_h = (kh - 1) * dilation // 2
    pad_w = (kw - 1) * dilation // 2
    oy = jnp.arange(Ho, dtype=jnp.float32) * stride
    ox = jnp.arange(Wo, dtype=jnp.float32) * stride
    ty, tx = jnp.meshgrid(
        jnp.arange(kh, dtype=jnp.float32) * dilation - pad_h,
        jnp.arange(kw, dtype=jnp.float32) * dilation - pad_w,
        indexing="ij",
    )
    sy = oy[None, :, None, None] + ty.reshape(-1)[None, None, None] + dy
    sx = ox[None, None, :, None] + tx.reshape(-1)[None, None, None] + dx
    P = Ho * Wo
    return (
        sy.reshape(B, P, K),
        sx.reshape(B, P, K),
        m.reshape(B, P, K),
    )


def _make_gather_kernel(H, W, K):
    def kernel(sy_ref, sx_ref, m_ref, x_ref, w_ref, o_ref, patch_ref):
        x = x_ref[0]  # (H*W, C)
        C = x.shape[-1]
        for k in range(K):
            sy = sy_ref[0, :, k]  # (P_TILE,)
            sx = sx_ref[0, :, k]
            mk = m_ref[0, :, k]
            iy0 = jnp.floor(sy)
            ix0 = jnp.floor(sx)
            fy = sy - iy0
            fx = sx - ix0
            acc = jnp.zeros((sy.shape[0], C), jnp.float32)
            for cy in (0, 1):
                for cx in (0, 1):
                    yy = iy0 + cy
                    xx = ix0 + cx
                    wgt = (
                        (fy if cy else 1.0 - fy)
                        * (fx if cx else 1.0 - fx)
                        * (yy >= 0.0) * (yy <= H - 1.0)
                        * (xx >= 0.0) * (xx <= W - 1.0)
                    ).astype(jnp.float32)
                    idx = (
                        jnp.clip(yy, 0.0, H - 1.0).astype(jnp.int32) * W
                        + jnp.clip(xx, 0.0, W - 1.0).astype(jnp.int32)
                    )
                    # row gather along sublanes (Mosaic dynamic-gather needs
                    # indices shaped like the output)
                    rows = jnp.take_along_axis(
                        x, jnp.broadcast_to(idx[:, None], (idx.shape[0], C)), axis=0
                    )
                    acc = acc + wgt[:, None] * rows.astype(jnp.float32)
            patch_ref[:, k * C : (k + 1) * C] = (acc * mk[:, None]).astype(patch_ref.dtype)
        o_ref[0] = jnp.dot(
            patch_ref[:], w_ref[:], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)

    return kernel


def _make_onehot_kernel(H, W, K):
    def kernel(sy_ref, sx_ref, m_ref, x_ref, w_ref, o_ref, patch_ref):
        x = x_ref[0]  # (H*W, C)
        C = x.shape[-1]
        P = sy_ref.shape[1]
        # dense source-pixel coordinates (1, H*W)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, H * W), 1)
        col_y = (col // W).astype(jnp.float32)
        col_x = (col % W).astype(jnp.float32)
        for k in range(K):
            sy = sy_ref[0, :, k][:, None]  # (P, 1)
            sx = sx_ref[0, :, k][:, None]
            mk = m_ref[0, :, k][:, None]
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - col_y))  # (P, H*W)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - col_x))
            S = (wy * wx * mk).astype(x.dtype)
            patch_ref[:, k * C : (k + 1) * C] = jnp.dot(
                S, x, preferred_element_type=jnp.float32
            ).astype(patch_ref.dtype)
        o_ref[0] = jnp.dot(
            patch_ref[:], w_ref[:], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)

    return kernel


def _dcn_pallas_raw(
    x: jax.Array,  # (B, H, W, Cin)
    off_mask: jax.Array,  # (B, Ho, Wo, 3K)
    weight: jax.Array,  # (kh, kw, Cin, Cout)
    stride: int,
    dilation: int,
    strategy: str,
) -> jax.Array:
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    _, Ho, Wo, _ = off_mask.shape
    P = Ho * Wo
    sy, sx, m = _sample_coords(off_mask, H, W, Ho, Wo, stride, dilation, kh, kw)

    # pad the pixel axis to a tile multiple
    Pp = -(-P // P_TILE) * P_TILE
    if Pp != P:
        pad = ((0, 0), (0, Pp - P), (0, 0))
        # out-of-range coords -> all corner weights zero -> zero rows
        sy = jnp.pad(sy, pad, constant_values=-10.0)
        sx = jnp.pad(sx, pad, constant_values=-10.0)
        m = jnp.pad(m, pad)

    xf = x.reshape(B, H * W, Cin)
    wf = weight.astype(x.dtype).reshape(K * Cin, Cout)

    make = _make_gather_kernel if strategy == "gather" else _make_onehot_kernel
    kernel = make(H, W, K)

    grid = (B, Pp // P_TILE)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, P_TILE, K), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_TILE, K), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_TILE, K), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * W, Cin), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K * Cin, Cout), lambda b, p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, P_TILE, Cout), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Pp, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((P_TILE, K * Cin), jnp.float32)],
    )(sy, sx, m, xf, wf)
    return out[:, :P].reshape(B, Ho, Wo, Cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def modulated_deform_conv_pallas(
    x, off_mask, weight, stride: int = 1, dilation: int = 1, strategy: str = "onehot"
):
    """DCNv2 with a Pallas forward; backward = VJP of the XLA formulation
    (identical math, so gradients are exact for the same function)."""
    return _dcn_pallas_raw(x, off_mask, weight, stride, dilation, strategy)


def _fwd(x, off_mask, weight, stride, dilation, strategy):
    return (
        _dcn_pallas_raw(x, off_mask, weight, stride, dilation, strategy),
        (x, off_mask, weight),
    )


def _bwd(stride, dilation, strategy, res, g):
    from petr_tpu.ops.dcn import modulated_deform_conv as xla_dcn

    x, off_mask, weight = res
    # impl MUST be pinned to "xla" here: "auto" resolves back to the Pallas
    # kernel on TPU, so the inner vjp would re-enter THIS custom-vjp _bwd and
    # recurse without a base case — an unbounded re-trace that ate ~130 GB of
    # host RSS before dying (round 3's "r50dcn train-compile OOM"; the
    # workaround flags never mattered, and CPU tests resolved auto->xla,
    # which is why unit gradient parity passed while every on-chip train
    # attempt died at startup). Pinned by
    # tests/test_pallas_dcn.py::test_pallas_backward_does_not_recurse.
    _, vjp = jax.vjp(
        lambda x, o, w: xla_dcn(x, o, w, stride=stride, dilation=dilation,
                                impl="xla"),
        x, off_mask, weight,
    )
    return vjp(g)


modulated_deform_conv_pallas.defvjp(_fwd, _bwd)
