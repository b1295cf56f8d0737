"""Flash-style masked cross-attention Pallas kernel for the PETR decoder.

The decoder hot op: 900 object queries attend over N*H*W multi-view tokens
(6000 at 800x320/p4, 24000 at 1600x640) with a key-padding mask. The XLA
path materializes the (B, heads, Q, L) logits in HBM (~170 MB fp32 at p4);
this kernel streams K/V blocks through VMEM with an online softmax so HBM
traffic is O(Q*D + L*D) instead of O(Q*L).

Layout notes (TPU tiling):
  * head_dim D (32 for 256/8) rides the lane axis of the q/k/v tiles; the
    (BQ x BK) logits tile is MXU-shaped (128 x 128).
  * the key-padding mask enters as -1e30 logit bias; fully-masked query rows
    produce 0/eps rather than NaN.
  * fp32 softmax accumulators regardless of input dtype.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, bk: int, scale: float):
    # q_ref: (1, BQ, D); k_ref/v_ref: (1, L, D); mask_ref: (1, L) int32 (1=pad)
    q = q_ref[0].astype(jnp.float32) * scale
    BQ, D = q.shape
    L = k_ref.shape[1]
    nblk = L // bk

    def body(i, carry):
        m, l, acc = carry
        kblk = k_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        vblk = v_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        mblk = mask_ref[0, pl.ds(i * bk, bk)]
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, bk)
        s = jnp.where(mblk[None, :] != 0, NEG, s)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, vblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((BQ, 1), NEG, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc0 = jnp.zeros((BQ, D), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, nblk, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, mult: int, value=0.0) -> jax.Array:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_cross_attention(
    q: jax.Array,  # (B, H, Q, D)
    k: jax.Array,  # (B, H, L, D)
    v: jax.Array,  # (B, H, L, D)
    key_padding_mask: Optional[jax.Array] = None,  # (B, L) True = pad
    *,
    block_q: int = 128,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    B, H, Q, D = q.shape
    L = k.shape[2]
    scale = 1.0 / math.sqrt(D)

    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((B, L), bool)
    mask = key_padding_mask.astype(jnp.int32)

    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    maskp = _pad_to(mask, 1, block_k, value=1)  # padded tail keys masked
    Qp, Lp = qp.shape[2], kp.shape[2]

    qp = qp.reshape(B * H, Qp, D)
    kp = kp.reshape(B * H, Lp, D)
    vp = vp.reshape(B * H, Lp, D)

    grid = (B * H, Qp // block_q)
    out = pl.pallas_call(
        functools.partial(_kernel, bk=block_k, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, Qp, D), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lp, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lp, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lp), lambda bh, qi: (bh // H, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(qp, kp, vp, mask)
    return out.reshape(B, H, Qp, D)[:, :, :Q, :]
