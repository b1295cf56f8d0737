"""Depthr-branch torch parity: DepthGTEncoder and the multi-attention
decoder layer vs from-scratch torch reconstructions of the reference
computations (`models/necks/depth_gt_encoder.py:68-158`,
`models/utils/multi_atten_decoder_layer.py:222-291`).

The decoder-layer test locks in the reference's key/value REBINDING:
`cross_depth_attn` sets key = value = depth_pos_embed, so the following
`cross_view_attn` in the shipped op order also attends the depth tokens
(with the image PE as key PE) — the image memory is never attended.
"""

import math

import numpy as np
import torch
import jax
import jax.numpy as jnp

from petr_tpu.models.depth_encoder import DepthGTEncoder
from petr_tpu.models.depthr_head import DepthrDecoderLayer
from tests.test_torch_parity import to_jax_mha_params


class TorchDepthGTEncoder(torch.nn.Module):
    def __init__(self, num_bins=80, depth_min=1e-3, depth_max=60.0, C=64, down_scale=4):
        super().__init__()
        self.depth_min, self.depth_max, self.num_bins = depth_min, depth_max, num_bins
        self.down_scale = down_scale
        n = 1 + int(math.log2(down_scale) - 1)
        self.depth_head = torch.nn.ModuleList()
        cin = num_bins + 1
        for _ in range(n):
            self.depth_head.append(torch.nn.Sequential(
                torch.nn.Conv2d(cin, C, 3, 2, 1),
                torch.nn.GroupNorm(32, C),
                torch.nn.ReLU(),
            ))
            cin = C
        self.depth_pos_embed = torch.nn.Embedding(int(depth_max) + 1, C)
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        idx = torch.arange(num_bins, dtype=torch.float32)
        centers = (idx + 0.5) ** 2 * bin_size / 2 - bin_size / 8 + depth_min
        self.bin_values = torch.cat([centers, torch.tensor([depth_max])])

    def forward(self, onehot):  # (B, N, h, w, D+1)
        B, N, h, w, D1 = onehot.shape
        x = onehot.flatten(0, 1).permute(0, 3, 1, 2)
        probs = x.clone()
        for layer in self.depth_head:
            x = layer(x)
        probs = torch.nn.functional.interpolate(probs, scale_factor=1 / self.down_scale)
        weighted = (probs * self.bin_values.reshape(1, -1, 1, 1)).sum(1)
        d = weighted.clamp(0, self.depth_max)
        lo = d.floor()
        delta = (d - lo).unsqueeze(-1)
        lo_i = lo.long()
        hi_i = (lo_i + 1).clamp(max=self.depth_pos_embed.num_embeddings - 1)
        pe = self.depth_pos_embed(lo_i) * (1 - delta) + self.depth_pos_embed(hi_i) * delta
        x = x + pe.permute(0, 3, 1, 2)
        hp, wp = x.shape[-2:]
        return (
            x.view(B, N, -1, hp, wp),
            weighted.view(B, N, hp, wp),
        )


def test_depth_gt_encoder_matches_torch():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    B, N, h, w, bins, C = 1, 2, 8, 12, 80, 64
    tenc = TorchDepthGTEncoder(num_bins=bins, C=C).eval()

    idx = rng.randint(0, bins + 1, (B, N, h, w))
    onehot = np.eye(bins + 1, dtype=np.float32)[idx]

    with torch.no_grad():
        ref_embed, ref_weighted = tenc(torch.from_numpy(onehot))

    ours = DepthGTEncoder(num_bins=bins, embed_dim=C, down_scale=4)
    params = {}
    for i, seq in enumerate(tenc.depth_head):
        conv, gn = seq[0], seq[1]
        params[f"conv{i}"] = {
            "kernel": conv.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": conv.bias.detach().numpy(),
        }
        params[f"gn{i}"] = {
            "scale": gn.weight.detach().numpy(),
            "bias": gn.bias.detach().numpy(),
        }
    params["depth_pos_embed"] = tenc.depth_pos_embed.weight.detach().numpy()

    embed, weighted = ours.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(onehot)
    )
    np.testing.assert_allclose(
        np.asarray(weighted), ref_weighted.numpy(), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(embed).transpose(0, 1, 4, 2, 3), ref_embed.numpy(), rtol=1e-4, atol=1e-4
    )


class TorchMultiAttenLayer(torch.nn.Module):
    """self_attn -> norm -> cross_depth_attn -> norm -> cross_view_attn ->
    norm -> ffn -> norm, WITH the reference's key/value rebinding."""

    def __init__(self, C=64, H=4, F=128):
        super().__init__()
        self.self_attn = torch.nn.MultiheadAttention(C, H, dropout=0.0, batch_first=True)
        self.cross_depth = torch.nn.MultiheadAttention(C, H, dropout=0.0, batch_first=True)
        self.cross_view = torch.nn.MultiheadAttention(C, H, dropout=0.0, batch_first=True)
        self.norms = torch.nn.ModuleList([torch.nn.LayerNorm(C) for _ in range(4)])
        self.fc1 = torch.nn.Linear(C, F)
        self.fc2 = torch.nn.Linear(F, C)

    def forward(self, query, key, value, query_pos, key_pos, depth_pos_embed, key_padding_mask):
        q = query + query_pos
        sa, _ = self.self_attn(q, q, query)
        query = self.norms[0](query + sa)
        # reference: key = value = depth_pos_embed (REBINDS for later ops)
        key = value = depth_pos_embed
        da, _ = self.cross_depth(
            query + query_pos, key + depth_pos_embed, value,
            key_padding_mask=key_padding_mask,
        )
        query = self.norms[1](query + da)
        # cross_view consumes the REBOUND key/value (depth tokens) + image PE
        va, _ = self.cross_view(
            query + query_pos, key + key_pos, value, key_padding_mask=key_padding_mask
        )
        query = self.norms[2](query + va)
        query = self.norms[3](query + self.fc2(torch.relu(self.fc1(query))))
        return query


def test_depthr_decoder_layer_matches_torch_rebinding():
    torch.manual_seed(1)
    C, H, F, B, Q, L = 64, 4, 128, 1, 9, 20
    tl = TorchMultiAttenLayer(C, H, F).eval()
    query = torch.randn(B, Q, C)
    memory = torch.randn(B, L, C)
    depth = torch.randn(B, L, C)
    qp = torch.randn(B, Q, C)
    kp = torch.randn(B, L, C)
    mask = torch.zeros(B, L, dtype=torch.bool)
    mask[:, 15:] = True
    with torch.no_grad():
        want = tl(query, memory, memory, qp, kp, depth, mask).numpy()

    def ln(mod):
        return {"scale": mod.weight.detach().numpy(), "bias": mod.bias.detach().numpy()}

    params = {
        "self_attn": to_jax_mha_params(tl.self_attn, C),
        "cross_depth_attn": to_jax_mha_params(tl.cross_depth, C),
        "cross_view_attn": to_jax_mha_params(tl.cross_view, C),
        "norm1": ln(tl.norms[0]),
        "norm2": ln(tl.norms[1]),
        "norm3": ln(tl.norms[2]),
        "norm4": ln(tl.norms[3]),
        "ffn": {
            "fc1": {"kernel": tl.fc1.weight.detach().numpy().T, "bias": tl.fc1.bias.detach().numpy()},
            "fc2": {"kernel": tl.fc2.weight.detach().numpy().T, "bias": tl.fc2.bias.detach().numpy()},
        },
    }
    ours = DepthrDecoderLayer(embed_dim=C, num_heads=H, ffn_dim=F, dropout_rate=0.0)
    got = ours.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(query.numpy()), jnp.asarray(memory.numpy()),
        jnp.asarray(qp.numpy()), jnp.asarray(kp.numpy()),
        jnp.asarray(depth.numpy()), jnp.asarray(mask.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    # sanity: with attend_memory=True the output differs (memory is attended)
    alt = DepthrDecoderLayer(
        embed_dim=C, num_heads=H, ffn_dim=F, dropout_rate=0.0, attend_memory=True
    ).apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(query.numpy()), jnp.asarray(memory.numpy()),
        jnp.asarray(qp.numpy()), jnp.asarray(kp.numpy()),
        jnp.asarray(depth.numpy()), jnp.asarray(mask.numpy()),
    )
    assert not np.allclose(np.asarray(alt), want, atol=1e-3)
