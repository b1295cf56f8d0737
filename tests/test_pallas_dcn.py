"""Pallas DCNv2 kernel vs the XLA gather formulation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from petr_tpu.ops.dcn import modulated_deform_conv
from petr_tpu.ops.pallas.dcn import modulated_deform_conv_pallas


def _case(B=2, H=9, W=11, Cin=8, Cout=16, stride=1, seed=0):
    rng = np.random.RandomState(seed)
    Ho, Wo = H // stride, W // stride
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
    off_mask = jnp.asarray(rng.randn(B, Ho, Wo, 27) * 1.5, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.1, jnp.float32)
    return x, off_mask, w


@pytest.mark.parametrize("strategy", ["onehot", "gather"])
@pytest.mark.parametrize("stride", [1, 2])
def test_pallas_dcn_matches_xla(strategy, stride):
    x, off_mask, w = _case(stride=stride)
    ref = modulated_deform_conv(x, off_mask, w, stride=stride)
    with pltpu.force_tpu_interpret_mode():
        out = modulated_deform_conv_pallas(x, off_mask, w, stride, 1, strategy)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pallas_dcn_grad_matches_xla():
    x, off_mask, w = _case(B=1, H=6, W=8, Cin=4, Cout=8)

    def loss_pallas(x, o, w):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(modulated_deform_conv_pallas(x, o, w, 1, 1, "onehot") ** 2)

    def loss_xla(x, o, w):
        return jnp.sum(modulated_deform_conv(x, o, w) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, off_mask, w)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, off_mask, w)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4)


def test_pallas_backward_does_not_recurse(monkeypatch):
    """Round-4 regression: the custom-VJP backward must pin impl="xla" for
    its inner vjp. With impl left at "auto" the env/backend can resolve it
    back to the Pallas kernel, re-entering _bwd without a base case — an
    unbounded re-trace that presented as the round-3 "r50dcn train-compile
    host-OOM" (~130 GB RSS) on the chip. Forcing the env to "pallas" here
    reproduces exactly the on-TPU resolution; make_jaxpr stays at the trace
    level, so this runs on CPU."""
    import sys

    monkeypatch.setenv("PETR_TPU_DCN_IMPL", "pallas")
    x, off_mask, w = _case(B=1, H=4, W=4, Cin=8, Cout=8)

    def loss(x, o, w):
        return jnp.sum(modulated_deform_conv_pallas(x, o, w, 1, 1, "onehot"))

    limit = sys.getrecursionlimit()
    try:
        # with the bug this blows the recursion limit (or runs unboundedly);
        # with the fix it traces in well under the limit
        sys.setrecursionlimit(400)
        jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(x, off_mask, w)
    finally:
        sys.setrecursionlimit(limit)
    # exactly ONE pallas_call (the forward); the backward is pure XLA
    assert str(jaxpr).count("pallas_call") == 1
