"""Fused im2col conv3x3 Pallas kernel vs XLA conv (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from petr_tpu.ops.pallas.conv3x3 import (
    _xla_reference,
    conv3x3_bn_relu,
    conv3x3_supported,
)


def _case(B=2, H=8, W=12, C=16, Co=24, seed=0, affine=True):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, Co) * 0.2, jnp.float32)
    mul = jnp.asarray(rng.rand(Co) + 0.5, jnp.float32) if affine else None
    add = jnp.asarray(rng.randn(Co) * 0.1, jnp.float32) if affine else None
    return x, w, mul, add


@pytest.mark.parametrize("affine,relu", [(True, True), (True, False), (False, True)])
def test_conv3x3_matches_xla(affine, relu):
    x, w, mul, add = _case(affine=affine)
    ref = _xla_reference(x, w, mul, add, relu)
    with pltpu.force_tpu_interpret_mode():
        out = conv3x3_bn_relu(x, w, mul, add, relu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_conv3x3_odd_rows_tile():
    # H with a small divisor structure exercises the row-tile picker
    x, w, mul, add = _case(B=1, H=10, W=25, C=8, Co=8)
    ref = _xla_reference(x, w, mul, add, True)
    with pltpu.force_tpu_interpret_mode():
        out = conv3x3_bn_relu(x, w, mul, add, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_conv3x3_grad_matches_xla():
    x, w, mul, add = _case(B=1, H=6, W=8, C=8, Co=8)

    def loss_pallas(x, w, mul, add):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(conv3x3_bn_relu(x, w, mul, add, True) ** 2)

    def loss_xla(x, w, mul, add):
        return jnp.sum(_xla_reference(x, w, mul, add, True) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, w, mul, add)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, w, mul, add)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4)


def test_supported_predicate():
    assert conv3x3_supported((6, 40, 100, 160), 1, 1)
    assert not conv3x3_supported((6, 40, 100, 160), 2, 1)
    assert not conv3x3_supported((6, 160, 400, 64), 1, 1) is None  # bool


def test_convbnrelu_dispatch_param_tree_identical(monkeypatch):
    """Both ConvBNReLU paths create the same params and the same function."""
    from petr_tpu.models.layers import ConvBNReLU

    m = ConvBNReLU(16, 3, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 12, 8), jnp.float32)
    monkeypatch.setenv("PETR_TPU_CONV_IMPL", "xla")
    v = m.init(jax.random.PRNGKey(0), x)
    y_xla = m.apply(v, x)

    monkeypatch.setenv("PETR_TPU_CONV_IMPL", "pallas")
    with pltpu.force_tpu_interpret_mode():
        v2 = m.init(jax.random.PRNGKey(0), x)
        y_pl = m.apply(v, x)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: a.shape == b.shape and np.allclose(a, b), v["params"], v2["params"])
    )
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla), rtol=2e-5, atol=2e-5)
