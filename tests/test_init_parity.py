"""Initialization parity with the reference defaults.

The reference trains its heads from scratch: torch nn.Linear/Conv2d defaults
(kaiming_uniform(a=sqrt(5)) kernel = U(+-1/sqrt(fan_in)), uniform bias), the
DETR xavier pass over the transformer (`petr_transformer.py:62-67`), torch
MHA's packed-xavier in_proj, and zero-init Detr3D attention weights
(`detr3d_transformer.py:306-308`). These checks pin the init DISTRIBUTIONS
(bounds + moments), which training-from-scratch fidelity depends on.
"""

import numpy as np
import jax
import jax.numpy as jnp

from petr_tpu.models.layers import FFN, MultiheadAttention, TorchLinear


def _bounds_and_std(x):
    x = np.asarray(x).ravel()
    return np.abs(x).max(), x.std()


def test_torch_linear_init_matches_torch_defaults():
    fan_in, out = 192, 256
    lin = TorchLinear(out)
    params = lin.init(jax.random.PRNGKey(0), jnp.zeros((4, fan_in)))["params"]
    kmax, kstd = _bounds_and_std(params["kernel"])
    bound = 1.0 / np.sqrt(fan_in)
    assert kmax <= bound + 1e-7
    # uniform(-b, b) std = b/sqrt(3)
    np.testing.assert_allclose(kstd, bound / np.sqrt(3), rtol=0.05)
    bmax, _ = _bounds_and_std(params["bias"])
    assert 0 < bmax <= bound + 1e-7


def test_mha_init_matches_torch_mha():
    C = 256
    mha = MultiheadAttention(C, 8)
    x = jnp.zeros((1, 4, C))
    params = mha.init(jax.random.PRNGKey(0), x, x, x)["params"]
    # packed in_proj xavier: bound sqrt(6/(C+3C))
    packed_bound = np.sqrt(6.0 / (4 * C))
    for p in ("q_proj", "k_proj", "v_proj"):
        kmax, kstd = _bounds_and_std(params[p]["kernel"])
        assert kmax <= packed_bound + 1e-7
        np.testing.assert_allclose(kstd, packed_bound / np.sqrt(3), rtol=0.05)
        assert np.all(np.asarray(params[p]["bias"]) == 0)
    # out_proj xavier: bound sqrt(6/(C+C))
    out_bound = np.sqrt(6.0 / (2 * C))
    kmax, kstd = _bounds_and_std(params["out_proj"]["kernel"])
    assert kmax <= out_bound + 1e-7
    np.testing.assert_allclose(kstd, out_bound / np.sqrt(3), rtol=0.05)
    assert np.all(np.asarray(params["out_proj"]["bias"]) == 0)

    # cross-check against actual torch MHA init statistics
    import torch

    tmha = torch.nn.MultiheadAttention(C, 8)
    tstd = tmha.in_proj_weight.detach().numpy().std()
    np.testing.assert_allclose(
        np.asarray(params["q_proj"]["kernel"]).std(), tstd, rtol=0.06
    )


def test_ffn_init_is_xavier():
    C, F = 256, 2048
    ffn = FFN(F, C)
    params = ffn.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, C)))["params"]
    b1 = np.sqrt(6.0 / (C + F))
    kmax, kstd = _bounds_and_std(params["fc1"]["kernel"])
    assert kmax <= b1 + 1e-7
    np.testing.assert_allclose(kstd, b1 / np.sqrt(3), rtol=0.05)


def test_ffn_bias_modes():
    """PETR's module-based xavier pass zeroes FFN biases; Detr3D's
    per-PARAMETER pass skips biases (torch uniform defaults stay)."""
    C, F = 64, 128
    p0 = FFN(F, C).init(jax.random.PRNGKey(0), jnp.zeros((1, 4, C)))["params"]
    assert np.all(np.asarray(p0["fc1"]["bias"]) == 0)
    assert np.all(np.asarray(p0["fc2"]["bias"]) == 0)

    p1 = FFN(F, C, torch_bias=True).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 4, C))
    )["params"]
    for name, fan_in in (("fc1", C), ("fc2", F)):
        bias = np.asarray(p1[name]["bias"])
        bound = 1.0 / np.sqrt(fan_in)
        assert 0 < np.abs(bias).max() <= bound + 1e-7
        # kernels stay xavier in both modes
        kmax, _ = _bounds_and_std(p1[name]["kernel"])
        assert kmax <= np.sqrt(6.0 / (C + F)) + 1e-7


def test_torch_linear_kernel_override_keeps_torch_bias():
    """Detr3D per-parameter xavier covers kernels only (pos_fc MLP)."""
    from petr_tpu.models.layers import xavier_uniform

    fan_in, out = 48, 96
    lin = TorchLinear(out, kernel_init=xavier_uniform)
    p = lin.init(jax.random.PRNGKey(0), jnp.zeros((2, fan_in)))["params"]
    kb = np.sqrt(6.0 / (fan_in + out))
    kmax, kstd = _bounds_and_std(p["kernel"])
    assert kmax <= kb + 1e-7
    np.testing.assert_allclose(kstd, kb / np.sqrt(3), rtol=0.07)
    bias = np.asarray(p["bias"])
    bb = 1.0 / np.sqrt(fan_in)
    assert 0 < np.abs(bias).max() <= bb + 1e-7


def test_normed_linear_gets_focal_prior_bias():
    """reference petr_head.py:282-284 sets m[-1].bias to the focal prior even
    when the final layer is a NormedLinear."""
    from petr_tpu.models.petr_head import ClsBranch

    cls = ClsBranch(32, 2, 10, normed=True)
    p = cls.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32)))["params"]
    np.testing.assert_allclose(np.asarray(p["out"]["bias"]), -4.59511985013459)


def test_cls_branch_focal_prior_and_detr3d_zero_weights():
    from petr_tpu.models.detr3d import Detr3DCrossAtten
    from petr_tpu.models.petr_head import ClsBranch

    cls = ClsBranch(32, 2, 10)
    p = cls.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32)))["params"]
    np.testing.assert_allclose(np.asarray(p["out"]["bias"]), -4.59511985013459)

    atn = Detr3DCrossAtten(embed_dim=32, dropout_rate=0.0)
    feats = [jnp.zeros((1, 2, 4, 6, 32))]
    q = jnp.zeros((1, 3, 32))
    p = atn.init(
        jax.random.PRNGKey(0), q, q, feats, jnp.full((1, 3, 3), 0.5),
        jnp.eye(4)[None, None].repeat(2, 1), (16.0, 24.0),
    )["params"]
    assert np.all(np.asarray(p["attention_weights"]["kernel"]) == 0)
    assert np.all(np.asarray(p["attention_weights"]["bias"]) == 0)


def test_petrv2_reglayer_init_is_torch_default():
    """Reference RegLayer (`petrv2_head.py:63-95`) builds bare `Linear`
    layers -> torch default init. Pins the round-3 fix (was nn.Dense
    lecun_normal + zero bias)."""
    import jax

    from petr_tpu.models.petrv2_head import RegLayer

    m = RegLayer(embed_dim=256, num_fcs=2)
    params = m.init(jax.random.PRNGKey(0), np.zeros((2, 4, 256), np.float32))[
        "params"
    ]
    for name in ("fc0", "fc1", "task0_fc", "task0_out"):
        k = np.asarray(params[name]["kernel"])
        b = np.asarray(params[name]["bias"])
        fan_in = k.shape[0]
        bound = 1.0 / np.sqrt(fan_in)
        assert np.abs(k).max() <= bound + 1e-7, name
        np.testing.assert_allclose(k.std(), bound / np.sqrt(3), rtol=0.1)
        assert np.abs(b).max() > 0.0, f"{name} bias must be uniform, not zeros"
