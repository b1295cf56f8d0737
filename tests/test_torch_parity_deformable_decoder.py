"""Deformable3DDetrDecoder torch parity: from-scratch torch reconstruction
of the reference decoder loop (`models/utils/detr.py:34-115`) — per layer a
canonical torch MultiheadAttention self-attn, an mmcv-convention multi-scale
deformable cross-attention rebuilt on F.grid_sample, post-norm FFN, then the
2-coord reference refinement ``sigmoid(reg[..., :2] + inverse_sigmoid(ref))``
with detach — against our flax `Deformable3DDetrDecoder` with transplanted
weights.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from petr_tpu.models.dgcnn import Deformable3DDetrDecoder

C, NH, NL, FFN_DIM, P, Q, B, H, W = 32, 4, 2, 64, 2, 6, 2, 8, 10


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _lin(p, x):
    # flax kernel (in, out) -> torch functional linear weight (out, in)
    return F.linear(x, _t(p["kernel"]).T, _t(p["bias"]))


def torch_mha(p, query, key, value):
    """torch-canonical MHA (seq-first, separate projection weights)."""
    q = query.transpose(0, 1)  # (Q, B, C)
    k = key.transpose(0, 1)
    v = value.transpose(0, 1)
    out, _ = F.multi_head_attention_forward(
        q, k, v, C, NH,
        in_proj_weight=None, in_proj_bias=torch.cat([
            _t(p["q_proj"]["bias"]), _t(p["k_proj"]["bias"]), _t(p["v_proj"]["bias"])
        ]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=_t(p["out_proj"]["kernel"]).T,
        out_proj_bias=_t(p["out_proj"]["bias"]),
        training=False, need_weights=False,
        use_separate_proj_weight=True,
        q_proj_weight=_t(p["q_proj"]["kernel"]).T,
        k_proj_weight=_t(p["k_proj"]["kernel"]).T,
        v_proj_weight=_t(p["v_proj"]["kernel"]).T,
    )
    return out.transpose(0, 1)


def torch_msdeform(p, query, bev, ref):
    """mmcv MultiScaleDeformableAttention on F.grid_sample (1 level).

    locations = ref + offsets / (W, H) in normalized coords; softmax over
    (levels x points); align_corners=False, zero padding."""
    dh = C // NH
    off = _lin(p["sampling_offsets"], query).reshape(B, Q, NH, 1, P, 2)
    w = _lin(p["attention_weights"], query).reshape(B, Q, NH, 1 * P)
    w = torch.softmax(w, -1).reshape(B, Q, NH, 1, P)

    v = _lin(p["value_proj"], bev.reshape(B, H * W, C)).reshape(B, H, W, NH, dh)
    v = v.permute(0, 3, 4, 1, 2).reshape(B * NH, dh, H, W)

    # pixel coords -> grid_sample normalized coords
    px = ref[:, :, None, None, :] * torch.tensor([W, H]).float() - 0.5 \
        + off[:, :, :, 0]  # (B, Q, NH, P, 2)
    gx = (px[..., 0] + 0.5) * 2.0 / W - 1.0
    gy = (px[..., 1] + 0.5) * 2.0 / H - 1.0
    grid = torch.stack([gx, gy], -1).permute(0, 2, 1, 3, 4).reshape(B * NH, Q, P, 2)
    s = F.grid_sample(v, grid, align_corners=False, padding_mode="zeros")
    s = s.reshape(B, NH, dh, Q, P)
    out = torch.einsum("bhdqp,bqhp->bqhd", s, w[:, :, :, 0])
    return _lin(p["out_proj"], out.reshape(B, Q, C))


def torch_layer(p, query, query_pos, bev, ref):
    qp = query + query_pos
    x = query + torch_mha(p["self_attn"], qp, qp, query)
    x = F.layer_norm(x, (C,), _t(p["norm1"]["scale"]), _t(p["norm1"]["bias"]))
    x = x + torch_msdeform(p["cross_attn"], x + query_pos, bev, ref)
    x = F.layer_norm(x, (C,), _t(p["norm2"]["scale"]), _t(p["norm2"]["bias"]))
    y = _lin(p["ffn"]["fc2"], F.relu(_lin(p["ffn"]["fc1"], x)))
    x = x + y
    return F.layer_norm(x, (C,), _t(p["norm3"]["scale"]), _t(p["norm3"]["bias"]))


def torch_reg_branch(p, x):
    for i in range(2):
        x = F.relu(_lin(p[f"fc{i}"], x))
    return _lin(p["out"], x)


def inverse_sigmoid_t(x, eps=1e-5):
    x = x.clamp(0, 1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def torch_decoder(params, query, query_pos, bev, ref):
    states, refs_in, regs = [], [], []
    for lid in range(NL):
        query = torch_layer(params[f"layer{lid}"], query, query_pos, bev, ref)
        reg = torch_reg_branch(params[f"reg_branch_{lid}"], query)
        states.append(query)
        refs_in.append(ref)
        regs.append(reg)
        # detr.py:99-104: 2-coord refinement vs the 10-dim reg, detached
        ref = torch.sigmoid(reg[..., :2] + inverse_sigmoid_t(ref)).detach()
    return torch.stack(states), torch.stack(refs_in), torch.stack(regs)


@pytest.mark.slow
def test_deformable_detr_decoder_torch_parity():
    rng = np.random.default_rng(0)
    query = rng.normal(0, 1, (B, Q, C)).astype(np.float32)
    query_pos = rng.normal(0, 1, (B, Q, C)).astype(np.float32)
    bev = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    # interior refs so border-padding conventions can't differ
    ref = rng.uniform(0.2, 0.8, (B, Q, 2)).astype(np.float32)

    m = Deformable3DDetrDecoder(C, NL, NH, FFN_DIM, P, 10, 2, 0.0, True)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(query),
                       jnp.asarray(query_pos), [jnp.asarray(bev)], jnp.asarray(ref))
    states, refs_in, regs = m.apply(
        variables, jnp.asarray(query), jnp.asarray(query_pos),
        [jnp.asarray(bev)], jnp.asarray(ref)
    )

    p = jax.tree.map(np.asarray, variables["params"])
    with torch.no_grad():
        t_states, t_refs, t_regs = torch_decoder(
            p, _t(query), _t(query_pos), _t(bev), _t(ref)
        )

    np.testing.assert_allclose(np.asarray(refs_in), t_refs.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(states), t_states.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(regs), t_regs.numpy(), atol=3e-5)


def test_dgcnn_head_deformable_detr_decoder_kind():
    """decoder_kind='deformable_detr' produces per-layer outputs with z
    decoded without a reference (2-coord scheme) and valid shapes."""
    from petr_tpu.models.dgcnn import DGCNN3DHead

    head = DGCNN3DHead(embed_dim=C, num_query=Q, num_layers=2, num_heads=NH,
                       ffn_dim=FFN_DIM, decoder_kind="deformable_detr",
                       num_points=P)
    bev = jnp.asarray(np.random.default_rng(1).normal(0, 1, (B, H, W, 16)), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), bev)
    out = head.apply(variables, bev)
    assert out["cls_logits"].shape == (2, B, Q, 10)
    assert out["bbox_codes"].shape == (2, B, Q, 10)
    assert np.isfinite(np.asarray(out["bbox_codes"])).all()
    # the learned reference projection is 2-coord in this mode
    ref_kernel = variables["params"]["reference_points"]["kernel"]
    assert ref_kernel.shape[-1] == 2