"""Flash cross-attention kernel vs naive softmax attention (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from petr_tpu.ops.pallas.cross_attention import flash_cross_attention


def naive(q, k, v, mask=None):
    D = q.shape[-1]
    s = jnp.einsum("bhqd,bhld->bhql", q, k).astype(jnp.float32) / np.sqrt(D)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], -1e30, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhql,bhld->bhqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("shape", [(1, 2, 128, 32), (2, 4, 200, 32)])
def test_matches_naive_unmasked(shape):
    B, H, Q, D = shape
    L = 640
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, H, Q, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D))
    out = flash_cross_attention(q, k, v, block_k=256, interpret=True)
    want = naive(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_matches_naive_masked():
    B, H, Q, D, L = 2, 2, 130, 32, 520
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, Q, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D))
    mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.3, (B, L))
    out = flash_cross_attention(q, k, v, mask, block_k=256, interpret=True)
    want = naive(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)
    # masked keys don't affect output
    k2 = jnp.where(mask[:, None, :, None], 555.0, k)
    out2 = flash_cross_attention(q, k2, v, mask, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=2e-5)


def test_all_masked_rows_finite():
    B, H, Q, D, L = 1, 1, 128, 32, 256
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, Q, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D))
    mask = jnp.ones((B, L), bool)
    out = flash_cross_attention(q, k, v, mask, block_k=256, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_bf16_inputs():
    B, H, Q, D, L = 1, 2, 128, 32, 512
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, Q, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D), jnp.bfloat16)
    out = flash_cross_attention(q, k, v, block_k=256, interpret=True)
    want = naive(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want), atol=0.05, rtol=0.05
    )


def test_custom_vjp_grads_match_naive():
    """Backward kernel vs jax autodiff of dense attention."""
    B, H, Q, D, L = 1, 2, 130, 32, 520
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, Q, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D))
    mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.3, (B, L))
    tangent = jax.random.normal(jax.random.PRNGKey(4), (B, H, Q, D))

    def loss_flash(q, k, v):
        out = flash_cross_attention(q, k, v, mask, 128, 256, True)
        return (out * tangent).sum()

    def loss_naive(q, k, v):
        return (naive(q, k, v, mask) * tangent).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gn, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, err_msg=f"d{name}"
        )


def test_custom_vjp_masked_keys_zero_grad():
    B, H, Q, D, L = 1, 1, 128, 32, 256
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, Q, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D))
    mask = jnp.zeros((B, L), bool).at[:, 200:].set(True)

    def loss(k, v):
        return flash_cross_attention(q, k, v, mask, 128, 256, True).sum()

    dk, dv = jax.grad(loss, argnums=(0, 1))(k, v)
    np.testing.assert_allclose(np.asarray(dk[:, :, 200:]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv[:, :, 200:]), 0.0, atol=1e-6)
