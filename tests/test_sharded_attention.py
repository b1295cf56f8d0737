"""Sequence-parallel cross-attention on the 8-device CPU mesh vs dense."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from petr_tpu.parallel.sharded_attention import sharded_cross_attention


def dense(q, k, v, mask):
    D = q.shape[-1]
    s = jnp.einsum("bhqd,bhld->bhql", q, k).astype(jnp.float32) / np.sqrt(D)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], -1e30, s)
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bhql,bhld->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


@pytest.fixture
def mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("data", "model"))


def test_sharded_matches_dense(mesh):
    B, H, Q, D, L = 2, 4, 30, 16, 64  # L divisible by model axis (4)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, Q, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D))
    mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.25, (B, L))
    out = sharded_cross_attention(q, k, v, mask, mesh)
    want = dense(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_sharded_no_mask(mesh):
    B, H, Q, D, L = 1, 2, 10, 8, 32
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, Q, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D))
    out = sharded_cross_attention(q, k, v, None, mesh)
    want = dense(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_sharded_shard_local_consistency(mesh):
    """A shard's padded keys never leak: garbage under mask is invariant."""
    B, H, Q, D, L = 1, 2, 12, 8, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, Q, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D))
    mask = jnp.zeros((B, L), bool).at[:, 48:].set(True)  # last shard all-pad
    out1 = sharded_cross_attention(q, k, v, mask, mesh)
    k2 = k.at[:, :, 48:].set(1e6)
    out2 = sharded_cross_attention(q, k2, v, mask, mesh)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


from petr_tpu.parallel.sharded_attention import sharded_flash_cross_attention


def test_sharded_flash_matches_dense(mesh):
    """Flash-per-shard + lse combine == dense attention (values)."""
    B, H, Q, D, L = 1, 2, 64, 32, 1024  # Ls = 256 per shard (block-aligned)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, Q, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D))
    mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.25, (B, L))
    out = sharded_flash_cross_attention(q, k, v, mask, mesh)
    want = dense(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_sharded_flash_empty_shard(mesh):
    """A shard whose keys are ALL masked contributes zero weight."""
    B, H, Q, D, L = 1, 1, 32, 32, 1024
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, Q, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D))
    mask = jnp.zeros((B, L), bool).at[:, 768:].set(True)  # last shard all-pad
    out = sharded_flash_cross_attention(q, k, v, mask, mesh)
    want = dense(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_sharded_flash_grads_match_dense(mesh):
    """Gradients flow through the per-shard flash VJP AND the lse-weighted
    combine; compare against autodiff of dense attention."""
    B, H, Q, D, L = 1, 2, 32, 32, 1024
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, Q, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D))
    mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.2, (B, L))
    t = jax.random.normal(jax.random.PRNGKey(4), (B, H, Q, D))

    def loss_sharded(q, k, v):
        return (sharded_flash_cross_attention(q, k, v, mask, mesh) * t).sum()

    def loss_dense(q, k, v):
        return (dense(q, k, v, mask) * t).sum()

    gs = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gs, gn, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=f"d{name}"
        )
