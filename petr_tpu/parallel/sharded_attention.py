"""Sequence-parallel decoder cross-attention over the token (model) axis.

The GSPMD path (sharding constraints in PETRTransformer) already lets XLA
partition the cross-attention; this module is the *explicit* formulation for
when we want deterministic control of the collective schedule: K/V tokens are
sharded over the ``model`` mesh axis, the 900 queries are replicated, each
shard computes a masked partial softmax (local max, exp-sum, weighted-V) and
the partials combine with one ``psum`` pair over ICI — the one-step
ring/Ulysses-style reduction sketched in SURVEY.md §2.10.

Usable under ``shard_map`` (see tests/test_sharded_attention.py) or inside a
pjit program via ``jax.shard_map`` with the mesh in context.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG = -1e30


def partial_softmax_attention(
    q: jax.Array,  # (B, H, Q, D) replicated
    k_shard: jax.Array,  # (B, H, Ls, D) local shard of keys
    v_shard: jax.Array,  # (B, H, Ls, D)
    mask_shard: Optional[jax.Array],  # (B, Ls) True = pad
    axis_name: str,
) -> jax.Array:
    """Exact masked softmax attention with K/V sharded over ``axis_name``."""
    D = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    s = jnp.einsum("bhqd,bhld->bhql", q.astype(jnp.float32), k_shard.astype(jnp.float32))
    s = s * scale
    if mask_shard is not None:
        s = jnp.where(mask_shard[:, None, None, :], NEG, s)

    local_max = s.max(axis=-1, keepdims=True)  # (B, H, Q, 1)
    global_max = jax.lax.pmax(local_max, axis_name)
    p = jnp.exp(s - global_max)
    local_denom = p.sum(axis=-1, keepdims=True)
    local_num = jnp.einsum("bhql,bhld->bhqd", p, v_shard.astype(jnp.float32))
    # one fused psum over the concatenated (denom, numerator) rides ICI once
    denom, num = jax.lax.psum((local_denom, local_num), axis_name)
    return (num / jnp.maximum(denom, 1e-20)).astype(q.dtype)


def sharded_cross_attention(
    q: jax.Array,  # (B, H, Q, D)
    k: jax.Array,  # (B, H, L, D) — L divisible by the model-axis size
    v: jax.Array,
    key_padding_mask: Optional[jax.Array],  # (B, L)
    mesh: jax.sharding.Mesh,
    model_axis: str = "model",
):
    """Convenience wrapper: shard_map the partial-softmax attention."""
    from jax.sharding import PartitionSpec as P

    in_specs = (
        P(),  # q replicated
        P(None, None, model_axis, None),
        P(None, None, model_axis, None),
        P(None, model_axis) if key_padding_mask is not None else None,
    )

    def body(q, ks, vs, ms):
        return partial_softmax_attention(q, ks, vs, ms, model_axis)

    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
    )(q, k, v, key_padding_mask)


def flash_partial_attention(
    q: jax.Array,  # (B, H, Q, D) replicated
    k_shard: jax.Array,  # (B, H, Ls, D) local shard of keys
    v_shard: jax.Array,  # (B, H, Ls, D)
    mask_shard: Optional[jax.Array],  # (B, Ls) True = pad
    axis_name: str,
) -> jax.Array:
    """Sequence-parallel FLASH attention: each shard runs the Pallas online
    -softmax kernel locally (returning per-row logsumexp), then the exact
    combine  out = sum_i exp(lse_i - M) out_i / sum_i exp(lse_i - M)  rides
    ICI as one psum pair. Fully differentiable — the flash VJP accepts the
    lse cotangent that the combine weights introduce."""
    from petr_tpu.ops.pallas.cross_attention import flash_cross_attention_with_lse

    out_i, lse_i = flash_cross_attention_with_lse(q, k_shard, v_shard, mask_shard)
    # remap the kernel's fully-masked-row sentinel (+1e30) to -inf semantics
    # so an empty shard contributes zero weight to the combine
    lse_c = jnp.where(lse_i >= 1e29, NEG, lse_i)
    # the combine is invariant to the shift m — detach it (and use
    # all_gather+max rather than pmax, which has no differentiation rule);
    # lse is only (B, H, Q) so the gather is negligible
    m = jax.lax.stop_gradient(
        jax.lax.all_gather(lse_c, axis_name).max(axis=0)
    )  # (B, H, Q)
    w = jnp.exp(lse_c - m)  # empty shards -> 0
    num, den = jax.lax.psum(
        (out_i.astype(jnp.float32) * w[..., None], w), axis_name
    )
    return (num / jnp.maximum(den[..., None], 1e-20)).astype(q.dtype)


def sharded_flash_cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: Optional[jax.Array],
    mesh: jax.sharding.Mesh,
    model_axis: str = "model",
):
    """shard_map wrapper for :func:`flash_partial_attention`."""
    from jax.sharding import PartitionSpec as P

    in_specs = (
        P(),
        P(None, None, model_axis, None),
        P(None, None, model_axis, None),
        P(None, model_axis) if key_padding_mask is not None else None,
    )

    def body(q, ks, vs, ms):
        return flash_partial_attention(q, ks, vs, ms, model_axis)

    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
    )(q, k, v, key_padding_mask)
