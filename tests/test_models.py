"""Model modules: shapes, parameter structure, behavioral invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from petr_tpu.models.layers import FrozenBatchNorm, MultiheadAttention
from petr_tpu.models.resnet import ResNet
from petr_tpu.models.vovnet import VoVNet
from petr_tpu.models.fpn import CPFPN
from petr_tpu.models.transformer import PETRTransformer
from petr_tpu.models.grid_mask import grid_mask


def test_frozen_bn_is_affine():
    bn = FrozenBatchNorm()
    x = jnp.ones((2, 4, 4, 8))
    params = bn.init(jax.random.PRNGKey(0), x)
    p = params["params"]
    p = jax.tree.map(lambda a: a, p)
    p["mean"] = jnp.full((8,), 2.0)
    p["var"] = jnp.full((8,), 4.0)
    p["scale"] = jnp.full((8,), 3.0)
    p["bias"] = jnp.full((8,), 1.0)
    y = bn.apply({"params": p}, x)
    # (1 - 2) / 2 * 3 + 1 = -0.5
    np.testing.assert_allclose(np.asarray(y), -0.5, rtol=1e-5)


def test_batch_stats_bn_normalizes():
    """bn_mode="batch" (mmcv norm_eval=False): per-batch moments actually
    normalize — the from-scratch training mode. Param tree is unchanged
    (stored mean/var stay for checkpoint parity, unused)."""
    bn_f = FrozenBatchNorm()
    bn_b = FrozenBatchNorm(use_batch_stats=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(3.0, 5.0, (4, 8, 8, 16)), jnp.float32)
    pf = bn_f.init(jax.random.PRNGKey(0), x)["params"]
    pb = bn_b.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(pf) == jax.tree_util.tree_structure(pb)
    y = np.asarray(bn_b.apply({"params": pb}, x))
    # identity affine at init: output is standardized per channel
    np.testing.assert_allclose(y.mean(axis=(0, 1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.var(axis=(0, 1, 2)), 1.0, atol=1e-3)
    # frozen mode with identity stats would have left the distribution alone
    yf = np.asarray(bn_f.apply({"params": pf}, x))
    assert abs(yf.mean() - 3.0) < 0.1

    # a deep from-scratch stack stays O(1) under batch stats (the frozen
    # variant at init is unnormalized and drifts with depth/training)
    bb = VoVNet(spec="V-39-eSE", out_indices=(2, 3), remat=False, bn_mode="batch")
    xb = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    params = bb.init(jax.random.PRNGKey(1), xb)["params"]
    outs = bb.apply({"params": params}, xb)
    for o in outs:
        assert float(jnp.abs(o).max()) < 50.0


def test_mha_matches_naive_sdpa():
    """Our MHA == manual softmax attention with the same projections."""
    mha = MultiheadAttention(embed_dim=16, num_heads=4)
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (2, 5, 16))
    kv = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 16))
    params = mha.init(rng, q, kv, kv)
    out = mha.apply(params, q, kv, kv)
    assert out.shape == (2, 5, 16)

    p = params["params"]

    def dense(name, x):
        return x @ p[name]["kernel"] + p[name]["bias"]

    qh = dense("q_proj", q).reshape(2, 5, 4, 4)
    kh = dense("k_proj", kv).reshape(2, 7, 4, 4)
    vh = dense("v_proj", kv).reshape(2, 7, 4, 4)
    logits = jnp.einsum("bqhd,blhd->bhql", qh, kh) / 2.0
    attn = jax.nn.softmax(logits, -1)
    want = dense("out_proj", jnp.einsum("bhql,blhd->bqhd", attn, vh).reshape(2, 5, 16))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_mha_key_padding_mask():
    mha = MultiheadAttention(embed_dim=8, num_heads=2)
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 8))
    kv = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 8))
    params = mha.init(jax.random.PRNGKey(2), q, kv, kv)
    mask = jnp.zeros((1, 6), bool).at[0, 3:].set(True)
    out_masked = mha.apply(params, q, kv, kv, key_padding_mask=mask)
    # garbage in padded keys must not change output
    kv2 = kv.at[0, 3:].set(999.0)
    out_masked2 = mha.apply(params, q, kv2, kv2, key_padding_mask=mask)
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_masked2), atol=1e-5)


@pytest.mark.slow
def test_resnet50_shapes():
    m = ResNet(depth=50, out_indices=(2, 3), remat_stages=False)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert outs[0].shape == (1, 4, 4, 1024)  # stride 16
    assert outs[1].shape == (1, 2, 2, 2048)  # stride 32


@pytest.mark.slow
def test_vovnet_shapes_and_param_count():
    m = VoVNet(spec="V-99-eSE", out_indices=(2, 3), remat=False)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert outs[0].shape == (1, 4, 4, 768)
    assert outs[1].shape == (1, 2, 2, 1024)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    # V2-99 ~ 69M params (conv weights; BN stats counted too)
    assert 60e6 < n_params < 80e6, n_params


def test_cpfpn_shapes():
    m = CPFPN(out_channels=32, num_outs=2)
    ins = [jnp.zeros((2, 8, 8, 48)), jnp.zeros((2, 4, 4, 64))]
    params = m.init(jax.random.PRNGKey(0), ins)
    outs = m.apply(params, ins)
    assert outs[0].shape == (2, 8, 8, 32)
    assert outs[1].shape == (2, 4, 4, 32)


def test_transformer_shapes_and_mask_invariance():
    m = PETRTransformer(num_layers=2, embed_dim=32, num_heads=4, ffn_dim=64, remat=False)
    B, N, H, W, C, Q = 1, 2, 3, 4, 32, 10
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, N, H, W, C))
    pos = jax.random.normal(jax.random.PRNGKey(1), (B, N, H, W, C))
    masks = jnp.zeros((B, N, H, W), bool).at[:, :, :, 3].set(True)
    qe = jax.random.normal(jax.random.PRNGKey(2), (Q, C))
    params = m.init(jax.random.PRNGKey(3), feats, masks, qe, pos)
    out = m.apply(params, feats, masks, qe, pos)
    assert out.shape == (2, B, Q, C)
    # padded tokens must not influence queries
    feats2 = feats.at[:, :, :, 3].set(777.0)
    out2 = m.apply(params, feats2, masks, qe, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)


def test_grid_mask_properties():
    imgs = jnp.ones((2, 3, 32, 32, 3))
    for exact in (True, False):
        out = grid_mask(jax.random.PRNGKey(0), imgs, prob=1.0, exact=exact)
        a = np.asarray(out)
        assert set(np.unique(a)).issubset({0.0, 1.0})
        frac = a.mean()
        assert 0.3 < frac < 1.0  # some pixels masked, most kept
        # same mask across views of a sample
        np.testing.assert_array_equal(a[0, 0], a[0, 1])
        # prob=0 -> identity
        out0 = grid_mask(jax.random.PRNGKey(0), imgs, prob=0.0, exact=exact)
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(imgs))
    # exact (reference) mode: ONE mask per call, shared across the batch
    out = grid_mask(jax.random.PRNGKey(1), imgs, prob=1.0, exact=True)
    np.testing.assert_array_equal(np.asarray(out)[0, 0], np.asarray(out)[1, 0])


def _reference_grid_mask_numpy(h, w, d, st_h, st_w, ratio=0.5, mode=1):
    """NumPy port of the reference rasterization
    (`models/utils/grid_mask.py:89-115`, rotate=1 => no rotation): 1.5x
    canvas, rows/cols [d*i+st, +l) zeroed, center crop, mode=1 inverts."""
    l = min(max(int(d * ratio + 0.5), 1), d - 1)
    hh, ww = int(1.5 * h), int(1.5 * w)
    mask = np.ones((hh, ww), np.float32)
    for i in range(hh // d):
        s = d * i + st_h
        mask[s : min(s + l, hh), :] = 0
    for i in range(ww // d):
        s = d * i + st_w
        mask[:, s : min(s + l, ww)] = 0
    mask = mask[(hh - h) // 2 : (hh - h) // 2 + h, (ww - w) // 2 : (ww - w) // 2 + w]
    return 1 - mask if mode == 1 else mask


def test_grid_mask_exact_parity_with_reference_raster():
    """The analytic on-device mask must equal the reference's rasterized
    mask bit-for-bit for every (d, st_h, st_w) — i.e. the exact mode is the
    same DISTRIBUTION, not merely the same family."""
    from petr_tpu.models.grid_mask import exact_mask

    rng = np.random.default_rng(0)
    for h, w in ((32, 32), (40, 100), (17, 23)):
        ds = list(range(2, min(h, 12))) + [h - 1]
        for d in ds:
            for _ in range(3):
                st_h, st_w = int(rng.integers(d)), int(rng.integers(d))
                for mode in (0, 1):
                    ours = np.asarray(exact_mask(h, w, d, st_h, st_w, mode=mode))
                    ref = _reference_grid_mask_numpy(h, w, d, st_h, st_w, mode=mode)
                    np.testing.assert_array_equal(
                        ours, ref, err_msg=f"h={h} w={w} d={d} st=({st_h},{st_w}) mode={mode}"
                    )


def test_grid_mask_exact_distribution():
    """Gate/period distribution: one Bernoulli(prob) per call; integer
    period d in [2, H); keep fraction for mode=1/ratio=.5 is ~75%."""
    imgs = jnp.ones((1, 1, 64, 64, 1))
    applied, fracs = 0, []
    for i in range(200):
        a = np.asarray(grid_mask(jax.random.PRNGKey(i), imgs, prob=0.7, exact=True))
        if (a == 1.0).all():
            continue
        applied += 1
        fracs.append(a.mean())
    assert 0.6 < applied / 200 < 0.8
    assert 0.5 < np.mean(fracs) < 0.9


def test_tta_feature_averaging_matches_single_forward():
    """(B, A, N, H, W, 3) TTA input with identical copies == single forward
    (reference aug_test averages extracted features, petr3d.py:239-247)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import __graft_entry__ as ge
    from petr_tpu.configs import get_config
    from petr_tpu.models import PETRDetector

    cfg = get_config("tiny_debug")
    model = PETRDetector(cfg.model, deterministic=True)
    B, N, H, W = 1, 6, *cfg.data.image_size
    batch = ge._batch(B, N, H, W, 4)
    variables = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["img2lidar"], batch["img_hw"]
    )
    single = model.apply(
        variables, batch["images"], batch["img2lidar"], batch["img_hw"]
    )
    tta_images = jnp.stack([batch["images"], batch["images"]], axis=1)  # (B, 2, N, ...)
    tta = model.apply(variables, tta_images, batch["img2lidar"], batch["img_hw"])
    np.testing.assert_allclose(
        np.asarray(tta["cls_logits"]), np.asarray(single["cls_logits"]), atol=1e-5
    )
    # and with actually-different variants the result differs
    tta2_images = jnp.stack([batch["images"], batch["images"] * 0.5], axis=1)
    tta2 = model.apply(variables, tta2_images, batch["img2lidar"], batch["img_hw"])
    assert np.abs(np.asarray(tta2["cls_logits"]) - np.asarray(single["cls_logits"])).max() > 1e-3


def test_cli_apply_tta():
    """--tta stacking: identity duplicates (decode-consistency no-op, covered
    end-to-end by test_tta_feature_averaging_matches_single_forward); hflip
    mirrors the width axis."""
    from petr_tpu.cli.test import apply_tta

    imgs = np.random.default_rng(0).normal(0, 1, (2, 3, 4, 6, 3)).astype(np.float32)
    assert apply_tta(imgs, "none") is imgs
    ident = apply_tta(imgs, "identity")
    assert ident.shape == (2, 2, 3, 4, 6, 3)
    np.testing.assert_array_equal(ident[:, 0], ident[:, 1])
    hf = apply_tta(imgs, "hflip")
    np.testing.assert_array_equal(hf[:, 1], imgs[..., ::-1, :])
    np.testing.assert_array_equal(hf[:, 0], imgs)
