"""Utility transforms: BN folding, publish round trip."""

import numpy as np
import jax
import jax.numpy as jnp

from petr_tpu.models.vovnet import VoVNet
from petr_tpu.utils.fuse import fold_frozen_bn


def test_fold_frozen_bn_preserves_output():
    m = VoVNet(spec="V-39-eSE", out_indices=(2, 3), remat=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    # non-trivial BN stats
    params = jax.tree.map(np.asarray, params)

    def perturb(node):
        if isinstance(node, dict):
            if set(node.keys()) >= {"scale", "bias", "mean", "var"}:
                rng = np.random.RandomState(0)
                node["mean"] = rng.randn(*node["mean"].shape).astype(np.float32)
                node["var"] = (np.abs(rng.randn(*node["var"].shape)) + 0.5).astype(np.float32)
                node["scale"] = rng.rand(*node["scale"].shape).astype(np.float32) + 0.5
            else:
                for v in node.values():
                    perturb(v)

    perturb(params)
    y0 = m.apply({"params": jax.tree.map(jnp.asarray, params)}, x)
    folded = fold_frozen_bn(params)
    y1 = m.apply({"params": jax.tree.map(jnp.asarray, folded)}, x)
    for a, b in zip(y0, y1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    # folded tree has identity multipliers
    assert np.allclose(folded["stem1"]["bn"]["scale"], 1.0)
    assert np.allclose(folded["stem1"]["bn"]["var"], 1.0)


def test_mfu_helpers():
    """compiled_flops reads XLA cost analysis; mfu_fields computes achieved
    TFLOP/s = flops/item * items/s (peak% only on known TPU kinds)."""
    import jax
    import jax.numpy as jnp

    import pytest

    from petr_tpu.utils.mfu import compiled_flops, device_peak_tflops, mfu_fields

    n = 256
    compiled = jax.jit(lambda a, b: a @ b).lower(
        jax.ShapeDtypeStruct((n, n), jnp.float32),
        jax.ShapeDtypeStruct((n, n), jnp.float32),
    ).compile()
    f = compiled_flops(compiled)
    if f is not None:  # cost analysis is backend-dependent
        assert f == pytest.approx(2 * n**3, rel=0.2)

    fields = mfu_fields(1e9, 100.0)  # 1 GFLOP/item at 100 items/s = 0.1 TFLOP/s
    assert fields["achieved_tflops"] == pytest.approx(0.1)
    assert fields["model_gflops"] == pytest.approx(1.0)
    assert mfu_fields(None, 100.0) == {}
    assert device_peak_tflops() is None  # CPU test platform
