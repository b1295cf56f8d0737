"""Numerical parity vs torch reference computations.

The reference decoder is plain torch (`nn.MultiheadAttention`, LayerNorm,
Linear) glued by mmcv. These tests rebuild the exact torch computation,
convert weights with our importer conventions, and require near-bitwise
agreement — the strongest parity evidence available without mmcv/the
released checkpoints.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from petr_tpu.models.layers import MultiheadAttention
from petr_tpu.models.transformer import PETRDecoderLayer


def to_jax_mha_params(tmha: torch.nn.MultiheadAttention, C: int):
    sd = {k: v.detach().numpy() for k, v in tmha.state_dict().items()}
    inw = sd["in_proj_weight"]
    inb = sd["in_proj_bias"]
    return {
        "q_proj": {"kernel": inw[:C].T, "bias": inb[:C]},
        "k_proj": {"kernel": inw[C : 2 * C].T, "bias": inb[C : 2 * C]},
        "v_proj": {"kernel": inw[2 * C :].T, "bias": inb[2 * C :]},
        "out_proj": {"kernel": sd["out_proj.weight"].T, "bias": sd["out_proj.bias"]},
    }


def test_mha_matches_torch_multihead_attention():
    torch.manual_seed(0)
    C, H, B, Q, L = 32, 4, 2, 7, 11
    tmha = torch.nn.MultiheadAttention(C, H, dropout=0.0, batch_first=True)
    tmha.eval()
    q = torch.randn(B, Q, C)
    kv = torch.randn(B, L, C)
    mask = torch.zeros(B, L, dtype=torch.bool)
    mask[:, 8:] = True
    with torch.no_grad():
        want, _ = tmha(q, kv, kv, key_padding_mask=mask)

    ours = MultiheadAttention(embed_dim=C, num_heads=H)
    params = {"params": jax.tree.map(jnp.asarray, to_jax_mha_params(tmha, C))}
    got = ours.apply(
        params, jnp.asarray(q.numpy()), jnp.asarray(kv.numpy()), jnp.asarray(kv.numpy()),
        key_padding_mask=jnp.asarray(mask.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


class TorchPETRLayer(torch.nn.Module):
    """The reference decoder layer computation in plain torch:
    self_attn -> norm -> cross_attn -> norm -> ffn -> norm, post-norm,
    residuals inside the attention wrappers, PE added to q/k."""

    def __init__(self, C=32, H=4, F=64):
        super().__init__()
        self.self_attn = torch.nn.MultiheadAttention(C, H, dropout=0.0, batch_first=True)
        self.cross_attn = torch.nn.MultiheadAttention(C, H, dropout=0.0, batch_first=True)
        self.norm1 = torch.nn.LayerNorm(C)
        self.norm2 = torch.nn.LayerNorm(C)
        self.norm3 = torch.nn.LayerNorm(C)
        self.fc1 = torch.nn.Linear(C, F)
        self.fc2 = torch.nn.Linear(F, C)

    def forward(self, query, memory, query_pos, key_pos, key_padding_mask):
        q = query + query_pos
        sa, _ = self.self_attn(q, q, query)
        query = self.norm1(query + sa)
        ca, _ = self.cross_attn(
            query + query_pos, memory + key_pos, memory, key_padding_mask=key_padding_mask
        )
        query = self.norm2(query + ca)
        ffn = self.fc2(torch.relu(self.fc1(query)))
        query = self.norm3(query + ffn)
        return query


def test_decoder_layer_matches_torch():
    torch.manual_seed(1)
    C, H, F, B, Q, L = 32, 4, 64, 1, 9, 20
    tl = TorchPETRLayer(C, H, F).eval()
    query = torch.randn(B, Q, C)
    memory = torch.randn(B, L, C)
    qp = torch.randn(B, Q, C)
    kp = torch.randn(B, L, C)
    mask = torch.zeros(B, L, dtype=torch.bool)
    mask[:, 15:] = True
    with torch.no_grad():
        want = tl(query, memory, qp, kp, mask).numpy()

    def ln(mod):
        return {"scale": mod.weight.detach().numpy(), "bias": mod.bias.detach().numpy()}

    params = {
        "self_attn": to_jax_mha_params(tl.self_attn, C),
        "cross_attn": to_jax_mha_params(tl.cross_attn, C),
        "norm1": ln(tl.norm1),
        "norm2": ln(tl.norm2),
        "norm3": ln(tl.norm3),
        "ffn": {
            "fc1": {"kernel": tl.fc1.weight.detach().numpy().T, "bias": tl.fc1.bias.detach().numpy()},
            "fc2": {"kernel": tl.fc2.weight.detach().numpy().T, "bias": tl.fc2.bias.detach().numpy()},
        },
    }
    ours = PETRDecoderLayer(embed_dim=C, num_heads=H, ffn_dim=F, dropout_rate=0.0)
    got = ours.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(query.numpy()), jnp.asarray(memory.numpy()),
        jnp.asarray(qp.numpy()), jnp.asarray(kp.numpy()), jnp.asarray(mask.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_frozen_bn_matches_torch_eval_bn():
    torch.manual_seed(2)
    C = 8
    tbn = torch.nn.BatchNorm2d(C).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.rand(C) + 0.5)
        tbn.bias.copy_(torch.randn(C))
        tbn.running_mean.copy_(torch.randn(C))
        tbn.running_var.copy_(torch.rand(C) + 0.5)
    x = torch.randn(2, C, 5, 6)
    with torch.no_grad():
        want = tbn(x).numpy().transpose(0, 2, 3, 1)

    from petr_tpu.models.layers import FrozenBatchNorm

    params = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
            "mean": jnp.asarray(tbn.running_mean.numpy()),
            "var": jnp.asarray(tbn.running_var.numpy()),
        }
    }
    got = FrozenBatchNorm().apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_conv_matches_torch():
    torch.manual_seed(3)
    tc = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    x = torch.randn(1, 3, 10, 12)
    with torch.no_grad():
        want = tc(x).numpy().transpose(0, 2, 3, 1)
    from flax import linen as nn

    conv = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False)
    kernel = tc.weight.detach().numpy().transpose(2, 3, 1, 0)
    got = conv.apply(
        {"params": {"kernel": jnp.asarray(kernel)}},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
