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


def _dropout_keep(seed, bh, qi, ki, BQ: int, bk: int, rate: float):
    """Deterministic per-(query, key) keep mask via a counter-based hash.

    Computed from global (q, k) indices + seed + batch*head, so the backward
    kernel regenerates the identical mask from the same coordinates (no mask
    materialization in HBM). Murmur3-finalizer avalanche over a 32-bit
    counter; plain jnp ops so it runs under Mosaic AND interpret mode
    (pltpu.prng_* has no CPU interpret lowering).
    """
    qoff = (jnp.asarray(qi) * BQ).astype(jnp.uint32)
    koff = (jnp.asarray(ki) * bk).astype(jnp.uint32)
    rows = jax.lax.broadcasted_iota(jnp.uint32, (BQ, bk), 0) + qoff
    cols = jax.lax.broadcasted_iota(jnp.uint32, (BQ, bk), 1) + koff
    h = rows * jnp.uint32(0x9E3779B9) + cols
    h = h + jnp.asarray(seed).astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
    h = h + jnp.asarray(bh).astype(jnp.uint32) * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return h >= thresh  # P(keep) = 1 - rate


def _kernel(
    q_ref, k_ref, v_ref, mask_ref, seed_ref, o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, bk: int, scale: float, rate: float, nk: int,
):
    # Grid (B*H, Qp//BQ, Lp//bk), K innermost: the online-softmax state
    # (m, l, acc) lives in VMEM scratch across the sequential ki steps, and
    # only one (bk, D) K/V block is resident at a time — nothing of size L
    # sits in VMEM (a full-L block lane-pads D=32 -> 128 and blows the 16 MB
    # scoped budget at 24k tokens).
    # q_ref: (1, BQ, D); k_ref/v_ref: (1, bk, D); mask_ref: (1, 1, bk) int32
    # (1=pad); seed_ref: (1,) int32 SMEM; o_ref: (1, BQ, D);
    # lse_ref: (1, 1, BQ).
    bh, qi, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * scale
    BQ, D = q.shape
    kblk = k_ref[0].astype(jnp.float32)
    vblk = v_ref[0].astype(jnp.float32)
    mblk = mask_ref[0, 0]

    s = jax.lax.dot_general(
        q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, bk)
    s = jnp.where(mblk[None, :] != 0, NEG, s)
    m = m_scr[...]
    m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
    alpha = jnp.exp(m - m_new)
    # explicit zero on masked cols: when every key so far is masked,
    # m_new == NEG and exp(s - m_new) would be exp(0) = 1, turning the row
    # into mean(V); the select keeps fully-masked rows exactly 0
    p = jnp.where(mblk[None, :] != 0, 0.0, jnp.exp(s - m_new))
    # softmax denominator accumulates WITHOUT dropout (dropout acts on the
    # normalized probs; keep/(1-rate) distributes over the division)
    l_new = l_scr[...] * alpha + p.sum(axis=-1, keepdims=True)
    if rate > 0.0:
        keep = _dropout_keep(seed_ref[0], bh, qi, ki, BQ, bk, rate)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    acc_new = acc_scr[...] * alpha + jax.lax.dot_general(
        p, vblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[...] = m_new
    l_scr[...] = l_new
    acc_scr[...] = acc_new

    @pl.when(ki == nk - 1)
    def _finish():
        l = jnp.maximum(l_scr[...], 1e-20)
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)
        # logsumexp per query row for the backward pass. Fully-masked rows
        # (m never rose above NEG) would give lse ~ NEG and make
        # exp(s - lse) = exp(0) = 1 in backward — force a huge POSITIVE lse
        # there so backward p underflows to 0 instead.
        mfin = m_scr[...]
        lse = jnp.where(mfin <= NEG * 0.5, -NEG, mfin + jnp.log(l))
        lse_ref[0, 0] = lse[:, 0]


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
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,  # scalar int32
):
    B, H, Q, D = q.shape
    L = k.shape[2]
    scale = 1.0 / math.sqrt(D)

    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((B, L), bool)
    mask = key_padding_mask.astype(jnp.int32)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)

    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    maskp = _pad_to(mask, 1, block_k, value=1)  # padded tail keys masked
    Qp, Lp = qp.shape[2], kp.shape[2]

    qp = qp.reshape(B * H, Qp, D)
    kp = kp.reshape(B * H, Lp, D)
    vp = vp.reshape(B * H, Lp, D)

    nk = Lp // block_k
    grid = (B * H, Qp // block_q, nk)
    out, lse = pl.pallas_call(
        functools.partial(_kernel, bk=block_k, scale=scale, rate=dropout_rate, nk=nk),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Qp, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, Qp), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi, ki: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, qi, ki: (bh, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, qi, ki: (bh, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda bh, qi, ki: (bh // H, 0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, D), lambda bh, qi, ki: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, ki: (bh, 0, qi), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        interpret=_maybe_interpret(interpret),
    )(qp, kp, vp, maskp[:, None, :], dropout_seed.reshape(1))
    return out.reshape(B, H, Qp, D)[:, :, :Q, :], lse[:, 0].reshape(B, H, Qp)[:, :, :Q]


def _bwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, seed_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref,
    *, bk: int, scale: float, rate: float,
):
    """FlashAttention-2 style backward, tiled over KEY blocks.

    Grid is (B*H, Lp // bk): each step handles one K/V block against the
    full query set (Q <= 1024 after padding — queries are cheap in PETR).
    dK/dV are per-block outputs; dQ — whose index map ignores ki — stays
    resident in VMEM and accumulates across the sequential ki iterations.
    Nothing of size L ever sits in VMEM, so the kernel scales to the
    1600x640 config's 24k tokens, and there is no serial inner loop.

    delta = rowsum(dO * O) is precomputed outside (one cheap XLA reduce).

    Refs: q/do/dq (1, Qp, D); k/v/dk/dv (1, bk, D); lse/delta (1, 1, Qp);
    mask (1, 1, bk).
    """
    bh, ki = pl.program_id(0), pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]  # (Qp, 1)
    delta = delta_ref[0, 0][:, None]  # (Qp, 1)
    kblk = k_ref[0].astype(jnp.float32)
    vblk = v_ref[0].astype(jnp.float32)
    mblk = mask_ref[0, 0]

    s = jax.lax.dot_general(
        q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Qp, bk)
    s = jnp.where(mblk[None, :] != 0, NEG, s)
    # p <= 1 by definition (softmax prob), so the exponent is clamped at 0:
    # s here is a RECOMPUTE of the forward logits while lse was saved — on
    # TPU, f32 dots decompose into bf16 passes, and once attention logits
    # grow large (|s| ~ 1e4 was observed in a real PETRv2 run) the rounding
    # gap between the two dots reaches ~1e2, overflowing exp() to inf and
    # NaN-poisoning every gradient upstream. The clamp removes the overflow
    # without changing true semantics (caught by NaN forensics, round 3).
    p = jnp.exp(jnp.minimum(s - lse, 0.0))  # probs; 0 on masked/padded
    # regenerate the forward's keep mask — the hash is a pure function of
    # GLOBAL (q, k) coordinates, so any blocking reproduces identical bits
    if rate > 0.0:
        keep = _dropout_keep(seed_ref[0], bh, 0, ki, p.shape[0], bk, rate)
        p_drop = jnp.where(keep, p / (1.0 - rate), 0.0)
    else:
        p_drop = p
    # dV_block = (P∘M/(1-r))^T dO
    dv = jax.lax.dot_general(
        p_drop, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dP = (dO V^T)∘M/(1-r) ; dS = P * (dP - delta)  [delta = rowsum(dO∘O)
    # still equals rowsum(dP∘P) under dropout]
    dp = jax.lax.dot_general(
        do, vblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if rate > 0.0:
        dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
    ds = p * (dp - delta)
    dq_ref[0] += (
        jax.lax.dot_general(
            ds, kblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    ).astype(dq_ref.dtype)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward_impl(
    q, k, v, mask, do, delta, lse, seed, *, block_k, interpret, dropout_rate
):
    B, H, Qp, D = q.shape
    Lp = k.shape[2]
    scale = 1.0 / math.sqrt(D)
    qf = q.reshape(B * H, Qp, D)
    kf = k.reshape(B * H, Lp, D)
    vf = v.reshape(B * H, Lp, D)
    dof = do.reshape(B * H, Qp, D)
    lsef = lse.reshape(B * H, 1, Qp)
    deltaf = delta.reshape(B * H, 1, Qp)
    grid = (B * H, Lp // block_k)
    qfull = lambda bh, ki: (bh, 0, 0)
    kblk = lambda bh, ki: (bh, ki, 0)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, bk=block_k, scale=scale, rate=dropout_rate),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Qp, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Lp, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Lp, D), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, Qp, D), qfull, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, D), kblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, D), kblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_k), lambda bh, ki: (bh // H, 0, ki), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, Qp, D), qfull, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Qp), qfull, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Qp), qfull, memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, Qp, D), qfull, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, D), kblk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, D), kblk, memory_space=pltpu.VMEM),
            ),
        ),
        interpret=_maybe_interpret(interpret),
    )(qf, kf, vf, mask[:, None, :], seed.reshape(1), dof, lsef, deltaf)
    return (
        dq.reshape(B, H, Qp, D),
        dk.reshape(B, H, Lp, D),
        dv.reshape(B, H, Lp, D),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_cross_attention(
    q: jax.Array,  # (B, H, Q, D)
    k: jax.Array,  # (B, H, L, D)
    v: jax.Array,  # (B, H, L, D)
    key_padding_mask: Optional[jax.Array] = None,  # (B, L) True = pad
    block_q: int = 128,
    block_k: int = 512,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,  # scalar int32 (train only)
) -> jax.Array:
    out, _ = _flash_forward(
        q, k, v, key_padding_mask, block_q=block_q, block_k=block_k,
        interpret=interpret, dropout_rate=dropout_rate, dropout_seed=dropout_seed,
    )
    return out


def _fca_fwd(q, k, v, key_padding_mask, block_q, block_k, interpret, dropout_rate, dropout_seed):
    out, lse = _flash_forward(
        q, k, v, key_padding_mask, block_q=block_q, block_k=block_k,
        interpret=interpret, dropout_rate=dropout_rate, dropout_seed=dropout_seed,
    )
    return out, (q, k, v, key_padding_mask, dropout_seed, out, lse)


def _flash_bwd_shared(
    q, k, v, key_padding_mask, dropout_seed, out, lse, gout, glse,
    *, block_q, block_k, interpret, dropout_rate,
):
    """Shared backward: handles cotangents w.r.t. the output AND (optionally)
    the per-row logsumexp. d lse/d s_j = p_j, so the lse cotangent folds into
    the delta term: ds = p * (dp - (delta - glse))."""
    B, H, Q, D = q.shape
    L = k.shape[2]
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((B, L), bool)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)
    mask = _pad_to(key_padding_mask.astype(jnp.int32), 1, block_k, value=1)
    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    dop = _pad_to(gout, 2, block_q)
    # delta = rowsum(dO * O): one cheap XLA reduce instead of shipping O
    # into the kernel
    delta = (gout.astype(jnp.float32) * out.astype(jnp.float32)).sum(-1)  # (B, H, Q)
    if glse is not None:
        delta = delta - glse.astype(jnp.float32)
    deltap = _pad_to(delta, 2, block_q)
    # padded query rows: lse = NEG so p = exp(s - NEG) would explode; use a
    # large positive lse instead so p ~ 0 on padded rows
    lsep = _pad_to(lse, 2, block_q, value=1e30)  # (B, H, Qp)
    dq, dk, dv = _flash_backward_impl(
        qp, kp, vp, mask, dop, deltap, lsep, dropout_seed,
        block_k=block_k, interpret=interpret, dropout_rate=dropout_rate,
    )
    dq = dq[:, :, :Q, :].astype(q.dtype)
    dk = dk[:, :, :L, :].astype(k.dtype)
    dv = dv[:, :, :L, :].astype(v.dtype)
    return dq, dk, dv


def _fca_bwd(block_q, block_k, interpret, dropout_rate, res, g):
    q, k, v, key_padding_mask, dropout_seed, out, lse = res
    dq, dk, dv = _flash_bwd_shared(
        q, k, v, key_padding_mask, dropout_seed, out, lse, g, None,
        block_q=block_q, block_k=block_k, interpret=interpret,
        dropout_rate=dropout_rate,
    )
    return dq, dk, dv, None, None


flash_cross_attention.defvjp(_fca_fwd, _fca_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_cross_attention_with_lse(
    q: jax.Array,  # (B, H, Q, D)
    k: jax.Array,  # (B, H, L, D)
    v: jax.Array,  # (B, H, L, D)
    key_padding_mask: Optional[jax.Array] = None,  # (B, L) True = pad
    block_q: int = 128,
    block_k: int = 512,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
):
    """Like ``flash_cross_attention`` but also returns the per-row fp32
    logsumexp (B, H, Q) — the combiner for sequence-parallel attention
    (`parallel/sharded_attention.py`). Fully-masked rows carry a +1e30
    sentinel. Differentiable in both outputs."""
    return _flash_forward(
        q, k, v, key_padding_mask, block_q=block_q, block_k=block_k,
        interpret=interpret, dropout_rate=dropout_rate, dropout_seed=dropout_seed,
    )


def _fcal_fwd(q, k, v, key_padding_mask, block_q, block_k, interpret, dropout_rate, dropout_seed):
    out, lse = _flash_forward(
        q, k, v, key_padding_mask, block_q=block_q, block_k=block_k,
        interpret=interpret, dropout_rate=dropout_rate, dropout_seed=dropout_seed,
    )
    return (out, lse), (q, k, v, key_padding_mask, dropout_seed, out, lse)


def _fcal_bwd(block_q, block_k, interpret, dropout_rate, res, g):
    q, k, v, key_padding_mask, dropout_seed, out, lse = res
    gout, glse = g
    dq, dk, dv = _flash_bwd_shared(
        q, k, v, key_padding_mask, dropout_seed, out, lse, gout, glse,
        block_q=block_q, block_k=block_k, interpret=interpret,
        dropout_rate=dropout_rate,
    )
    return dq, dk, dv, None, None


flash_cross_attention_with_lse.defvjp(_fcal_fwd, _fcal_bwd)
