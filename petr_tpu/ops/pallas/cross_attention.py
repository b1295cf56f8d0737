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


def _maybe_interpret(interpret: bool) -> bool:
    # Mosaic kernels only compile for TPU; on CPU (unit tests, debug) fall
    # back to interpret mode transparently.
    return interpret or jax.default_backend() == "cpu"


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, bk: int, scale: float):
    # q_ref: (1, BQ, D); k_ref/v_ref: (1, L, D); mask_ref: (1, 1, L) int32
    # (1=pad); lse_ref: (1, 1, BQ). Singleton middle dims keep the last-two
    # block dims tile-aligned (TPU requires (8k, 128k) or exact-size blocks).
    q = q_ref[0].astype(jnp.float32) * scale
    BQ, D = q.shape
    L = k_ref.shape[1]
    nblk = L // bk

    def body(i, carry):
        m, l, acc = carry
        kblk = k_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        vblk = v_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        mblk = mask_ref[0, 0, pl.ds(i * bk, bk)]
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
    m, l, acc = jax.lax.fori_loop(0, nblk, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)
    # logsumexp per query row (for the backward pass); fully-masked rows get
    # a huge negative lse so exp(s - lse) stays 0 there
    lse_ref[0, 0] = (m + jnp.log(jnp.maximum(l, 1e-20)))[:, 0]


def _pad_to(x: jax.Array, axis: int, mult: int, value=0.0) -> jax.Array:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _flash_forward(
    q: jax.Array,  # (B, H, Q, D)
    k: jax.Array,  # (B, H, L, D)
    v: jax.Array,  # (B, H, L, D)
    key_padding_mask: Optional[jax.Array] = None,  # (B, L) True = pad
    *,
    block_q: int = 128,
    block_k: int = 512,
    interpret: bool = False,
):
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
    out, lse = pl.pallas_call(
        functools.partial(_kernel, bk=block_k, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Qp, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, Qp), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lp, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lp, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Lp), lambda bh, qi: (bh // H, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda bh, qi: (bh, 0, qi), memory_space=pltpu.VMEM),
            ),
        ),
        interpret=_maybe_interpret(interpret),
    )(qp, kp, vp, maskp[:, None, :])
    return out.reshape(B, H, Qp, D)[:, :, :Q, :], lse[:, 0].reshape(B, H, Qp)[:, :, :Q]


def _bwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, o_ref, lse_ref,
    dq_ref, dk_ref, dv_ref,
    *, bk: int, scale: float,
):
    """FlashAttention-2 style backward, tiled over query blocks.

    Grid is (B*H, Qp // BQ); the inner (last) grid axis walks query blocks
    so the dK/dV blocks — whose index map ignores qi — stay resident in
    VMEM and accumulate across the sequential qi iterations. Tiling over q
    keeps the (BQ x bk) intermediates within the scoped-VMEM limit (a full
    1024 x 512 tile set blew the 16 MB budget at PETR sizes).

    Refs: q/do/o/dq (1, BQ, D); k/v/dk/dv (1, L, D); lse (1, 1, BQ);
    mask (1, 1, L).
    """
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]  # (BQ, 1)
    # D_i = rowsum(dO * O)
    delta = (do * o).sum(axis=-1, keepdims=True)  # (BQ, 1)

    BQ, D = q.shape
    L = k_ref.shape[1]
    nblk = L // bk

    def body(i, dq_acc):
        kblk = k_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        vblk = v_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        mblk = mask_ref[0, 0, pl.ds(i * bk, bk)]
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(mblk[None, :] != 0, NEG, s)
        p = jnp.exp(s - lse)  # (BQ, bk); 0 on masked/padded cols
        # dV_block += P^T dO
        dv = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dP = dO V^T ; dS = P * (dP - delta)
        dp = jax.lax.dot_general(
            do, vblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dq_acc = dq_acc + jax.lax.dot_general(
            ds, kblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        # dK_block += dS^T Q * scale
        dk = (
            jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )
        dk_ref[0, pl.ds(i * bk, bk), :] += dk.astype(dk_ref.dtype)
        dv_ref[0, pl.ds(i * bk, bk), :] += dv.astype(dv_ref.dtype)
        return dq_acc

    dq = jax.lax.fori_loop(0, nblk, body, jnp.zeros((BQ, D), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_backward_impl(q, k, v, mask, do, o, lse, *, block_q, block_k, interpret):
    B, H, Qp, D = q.shape
    Lp = k.shape[2]
    scale = 1.0 / math.sqrt(D)
    qf = q.reshape(B * H, Qp, D)
    kf = k.reshape(B * H, Lp, D)
    vf = v.reshape(B * H, Lp, D)
    dof = do.reshape(B * H, Qp, D)
    of = o.reshape(B * H, Qp, D)
    lsef = lse.reshape(B * H, 1, Qp)
    grid = (B * H, Qp // block_q)
    qblk = lambda bh, qi: (bh, qi, 0)
    lfull = lambda bh, qi: (bh, 0, 0)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, bk=block_k, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Qp, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Lp, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Lp, D), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D), qblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lp, D), lfull, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lp, D), lfull, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Lp), lambda bh, qi: (bh // H, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, D), qblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, D), qblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda bh, qi: (bh, 0, qi), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, D), qblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lp, D), lfull, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lp, D), lfull, memory_space=pltpu.VMEM),
            ),
        ),
        interpret=_maybe_interpret(interpret),
    )(qf, kf, vf, mask[:, None, :], dof, of, lsef)
    return (
        dq.reshape(B, H, Qp, D),
        dk.reshape(B, H, Lp, D),
        dv.reshape(B, H, Lp, D),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_cross_attention(
    q: jax.Array,  # (B, H, Q, D)
    k: jax.Array,  # (B, H, L, D)
    v: jax.Array,  # (B, H, L, D)
    key_padding_mask: Optional[jax.Array] = None,  # (B, L) True = pad
    block_q: int = 128,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    out, _ = _flash_forward(
        q, k, v, key_padding_mask, block_q=block_q, block_k=block_k, interpret=interpret
    )
    return out


def _fca_fwd(q, k, v, key_padding_mask, block_q, block_k, interpret):
    out, lse = _flash_forward(
        q, k, v, key_padding_mask, block_q=block_q, block_k=block_k, interpret=interpret
    )
    return out, (q, k, v, key_padding_mask, out, lse)


def _fca_bwd(block_q, block_k, interpret, res, g):
    q, k, v, key_padding_mask, out, lse = res
    B, H, Q, D = q.shape
    L = k.shape[2]
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((B, L), bool)
    mask = _pad_to(key_padding_mask.astype(jnp.int32), 1, block_k, value=1)
    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    dop = _pad_to(g, 2, block_q)
    op = _pad_to(out, 2, block_q)
    # padded query rows: lse = NEG so p = exp(s - NEG) would explode; use a
    # large positive lse instead so p ~ 0 on padded rows
    lsep = _pad_to(lse, 2, block_q, value=1e30)  # (B, H, Qp)
    dq, dk, dv = _flash_backward_impl(
        qp, kp, vp, mask, dop, op, lsep,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )
    dq = dq[:, :, :Q, :].astype(q.dtype)
    dk = dk[:, :, :L, :].astype(k.dtype)
    dv = dv[:, :, :L, :].astype(v.dtype)
    return dq, dk, dv, None


flash_cross_attention.defvjp(_fca_fwd, _fca_bwd)
