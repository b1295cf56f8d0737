"""Multi-scale deformable attention vs direct evaluation."""

import numpy as np
import jax
import jax.numpy as jnp

from petr_tpu.ops.deformable import deformable_attention_module_forward, ms_deformable_attention


def test_single_point_zero_offset_is_bilinear_lookup():
    B, Q, nh, dh, H, W = 1, 3, 2, 4, 6, 8
    rng = jax.random.PRNGKey(0)
    val = jax.random.normal(rng, (B, H, W, nh, dh))
    ref = jnp.asarray([[[0.25, 0.5], [0.5, 0.5], [0.9, 0.1]]])  # (1, 3, 2)
    offsets = jnp.zeros((B, Q, nh, 1, 1, 2))
    weights = jnp.ones((B, Q, nh, 1, 1))
    out = ms_deformable_attention([val], ref, offsets, weights)
    assert out.shape == (B, Q, nh, dh)
    # query 1 at center of the feature map
    from petr_tpu.ops.sampling import bilinear_sample

    want = bilinear_sample(val[0, :, :, 0, :], jnp.asarray([0.5 * W - 0.5, 0.5 * H - 0.5]))
    np.testing.assert_allclose(np.asarray(out[0, 1, 0]), np.asarray(want), atol=1e-5)


def test_weights_convex_combination():
    B, Q, nh, dh, H, W = 1, 2, 1, 4, 5, 5
    val = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, nh, dh))
    ref = jnp.full((B, Q, 2), 0.5)
    offsets = jnp.zeros((B, Q, nh, 1, 2, 2)).at[..., 1, 0].set(1.0)  # second point +1px x
    w = jnp.asarray([0.3, 0.7])[None, None, None, None, :]
    weights = jnp.broadcast_to(w, (B, Q, nh, 1, 2))
    out = ms_deformable_attention([val], ref, offsets, weights)
    from petr_tpu.ops.sampling import bilinear_sample

    c = jnp.asarray([0.5 * W - 0.5, 0.5 * H - 0.5])
    a = bilinear_sample(val[0, :, :, 0, :], c)
    b = bilinear_sample(val[0, :, :, 0, :], c + jnp.asarray([1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), np.asarray(0.3 * a + 0.7 * b), atol=1e-5)


def test_module_forward_shapes_two_levels():
    B, Q, C, nh, P = 2, 5, 16, 4, 2
    rng = np.random.RandomState(0)
    levels = [
        jnp.asarray(rng.randn(B, 8, 10, C), jnp.float32),
        jnp.asarray(rng.randn(B, 4, 5, C), jnp.float32),
    ]
    L = 2
    q = jnp.asarray(rng.randn(B, Q, C), jnp.float32)
    ref = jnp.asarray(rng.rand(B, Q, 2), jnp.float32)
    kw = dict(
        sampling_offsets_w=jnp.asarray(rng.randn(C, nh * L * P * 2) * 0.01, jnp.float32),
        sampling_offsets_b=jnp.zeros(nh * L * P * 2),
        attn_weights_w=jnp.asarray(rng.randn(C, nh * L * P) * 0.01, jnp.float32),
        attn_weights_b=jnp.zeros(nh * L * P),
        value_proj_w=jnp.eye(C),
        value_proj_b=jnp.zeros(C),
        out_proj_w=jnp.eye(C),
        out_proj_b=jnp.zeros(C),
        num_heads=nh,
        num_points=P,
    )
    out = deformable_attention_module_forward(q, levels, ref, **kw)
    assert out.shape == (B, Q, C)
    assert np.isfinite(np.asarray(out)).all()


def test_flax_module_offset_bias_init_and_forward():
    from petr_tpu.ops.deformable import MSDeformableAttention

    B, Q, C = 2, 5, 32
    rng = np.random.RandomState(1)
    levels = [
        jnp.asarray(rng.randn(B, 8, 10, C), jnp.float32),
        jnp.asarray(rng.randn(B, 4, 5, C), jnp.float32),
    ]
    q = jnp.asarray(rng.randn(B, Q, C), jnp.float32)
    ref = jnp.asarray(rng.rand(B, Q, 2), jnp.float32)
    mod = MSDeformableAttention(C, num_heads=4, num_points=2)
    variables = mod.init(jax.random.PRNGKey(0), q, levels, ref)
    out = mod.apply(variables, q, levels, ref)
    assert out.shape == (B, Q, C)
    assert np.isfinite(np.asarray(out)).all()
    # mmcv-style bias init: per-head ring directions scaled by point index
    bias = np.asarray(variables["params"]["sampling_offsets"]["bias"]).reshape(4, 2, 2, 2)
    np.testing.assert_allclose(bias[:, :, 1, :], 2.0 * bias[:, :, 0, :], atol=1e-5)
    norms = np.abs(bias[:, 0, 0, :]).max(-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # offsets kernel starts at zero
    assert np.abs(np.asarray(variables["params"]["sampling_offsets"]["kernel"])).max() == 0.0


def test_dgcnn_head_deformable_attn_kind():
    from petr_tpu.models.dgcnn import DGCNN3DHead

    B, H, W, C = 1, 8, 8, 32
    bev = jnp.asarray(np.random.RandomState(0).randn(B, H, W, C), jnp.float32)
    head = DGCNN3DHead(
        num_classes=4, embed_dim=32, num_query=12, num_layers=2, num_heads=4,
        ffn_dim=64, attn_kind="deformable",
    )
    variables = head.init(jax.random.PRNGKey(0), bev)
    out = head.apply(variables, bev)
    assert out["cls_logits"].shape == (2, B, 12, 4)
    assert out["bbox_codes"].shape == (2, B, 12, 10)
    assert np.isfinite(np.asarray(out["bbox_codes"])).all()
