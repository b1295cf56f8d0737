"""Full PETR-head numerical parity: a from-scratch torch reconstruction of
the reference head forward (`models/dense_heads/petr_head.py:286-334,366-468`
+ `models/utils/petr_transformer.py` + `positional_encoding.py:60-110`),
with the reference's state_dict key conventions, imported through
`utils.torch_convert`, must match our flax PETRHead to fp32 precision.

This covers in one numeric check: padding masks + nearest interpolation, the
frustum 3D PE (LID bins, img2lidar back-projection, normalize,
inverse_sigmoid, conv-MLP), the camera-aware sine PE (incl. its BLOCK sin/cos
channel order — `torch.stack(dim=4)` on a 5-d tensor does NOT interleave),
adapt_pos3d, pos2posemb3d (interleaved), query embedding, the full decoder
stack with shared post-norm, shared cls/reg branches, reference-point offset
decode, and pc_range denormalization — plus the head key map of the
checkpoint converter.
"""

import math
from collections import OrderedDict

import numpy as np
import torch
import jax
import jax.numpy as jnp

from petr_tpu.models.petr_head import PETRHead
from petr_tpu.utils.torch_convert import convert_state_dict


# ---------------------------------------------------------------- torch side
def t_inverse_sigmoid(x, eps=1e-5):
    x = x.clamp(min=0, max=1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def t_pos2posemb3d(pos, num_pos_feats=128, temperature=10000):
    scale = 2 * math.pi
    pos = pos * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    out = []
    for axis in (1, 0, 2):  # reference channel order (y, x, z)
        p = pos[..., axis, None] / dim_t
        out.append(
            torch.stack((p[..., 0::2].sin(), p[..., 1::2].cos()), dim=-1).flatten(-2)
        )
    return torch.cat(out, dim=-1)


def t_sine_pe_3d(mask, num_feats, temperature=10000.0, eps=1e-6):
    """SinePositionalEncoding3D: cumsum over (n, y, x); stack(dim=4) on the
    5-d tensor puts each axis's feats in block order [sins | coss]."""
    not_mask = 1 - mask.to(torch.int)
    n_embed = not_mask.cumsum(1, dtype=torch.float32)
    y_embed = not_mask.cumsum(2, dtype=torch.float32)
    x_embed = not_mask.cumsum(3, dtype=torch.float32)
    scale = 2 * math.pi
    n_embed = n_embed / (n_embed[:, -1:, :, :] + eps) * scale
    y_embed = y_embed / (y_embed[:, :, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, :, -1:] + eps) * scale
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    B, N, H, W = mask.shape
    outs = []
    for emb in (n_embed, y_embed, x_embed):
        p = emb[..., None] / dim_t
        outs.append(
            torch.stack((p[..., 0::2].sin(), p[..., 1::2].cos()), dim=4).view(B, N, H, W, -1)
        )
    return torch.cat(outs, dim=4).permute(0, 1, 4, 2, 3)  # (B, N, 3F, H, W)


class AttnWrap(torch.nn.Module):
    def __init__(self, C, heads):
        super().__init__()
        self.attn = torch.nn.MultiheadAttention(C, heads, dropout=0.0, batch_first=True)


class FFNWrap(torch.nn.Module):
    """mmcv FFN key layout: layers.0.0 (Linear) and layers.1 (Linear)."""

    def __init__(self, C, F):
        super().__init__()
        self.layers = torch.nn.Sequential(
            torch.nn.Sequential(torch.nn.Linear(C, F), torch.nn.ReLU(), torch.nn.Dropout(0.0)),
            torch.nn.Linear(F, C),
        )

    def forward(self, x):
        return self.layers(x)


class TorchDecoderLayer(torch.nn.Module):
    def __init__(self, C, heads, F):
        super().__init__()
        self.attentions = torch.nn.ModuleList([AttnWrap(C, heads), AttnWrap(C, heads)])
        self.ffns = torch.nn.ModuleList([FFNWrap(C, F)])
        self.norms = torch.nn.ModuleList([torch.nn.LayerNorm(C) for _ in range(3)])

    def forward(self, query, memory, query_pos, key_pos, key_padding_mask):
        q = query + query_pos
        sa, _ = self.attentions[0].attn(q, q, query)
        query = self.norms[0](query + sa)
        ca, _ = self.attentions[1].attn(
            query + query_pos, memory + key_pos, memory, key_padding_mask=key_padding_mask
        )
        query = self.norms[1](query + ca)
        query = self.norms[2](query + self.ffns[0](query))
        return query


class TorchDecoder(torch.nn.Module):
    def __init__(self, num_layers, C, heads, F):
        super().__init__()
        self.layers = torch.nn.ModuleList(
            [TorchDecoderLayer(C, heads, F) for _ in range(num_layers)]
        )
        self.post_norm = torch.nn.LayerNorm(C)

    def forward(self, query, memory, query_pos, key_pos, key_padding_mask):
        outs = []
        for layer in self.layers:
            query = layer(query, memory, query_pos, key_pos, key_padding_mask)
            outs.append(self.post_norm(query))
        return torch.stack(outs)


class TorchTransformer(torch.nn.Module):
    def __init__(self, num_layers, C, heads, F):
        super().__init__()
        self.decoder = TorchDecoder(num_layers, C, heads, F)


class TorchPETRHead(torch.nn.Module):
    """Reference-keyed PETRHead reconstruction (behavior of
    `petr_head.py:366-468`, batch-first attention)."""

    def __init__(self, Cin, C, heads, F, num_layers, Q, ncls, D, code_size,
                 position_range, pc_range, depth_start=1.0):
        super().__init__()
        self.C, self.D, self.depth_start = C, D, depth_start
        self.position_range = position_range
        self.pc_range = pc_range
        self.input_proj = torch.nn.Conv2d(Cin, C, 1)
        cls_branch = torch.nn.Sequential(
            torch.nn.Linear(C, C), torch.nn.LayerNorm(C), torch.nn.ReLU(),
            torch.nn.Linear(C, C), torch.nn.LayerNorm(C), torch.nn.ReLU(),
            torch.nn.Linear(C, ncls),
        )
        reg_branch = torch.nn.Sequential(
            torch.nn.Linear(C, C), torch.nn.ReLU(),
            torch.nn.Linear(C, C), torch.nn.ReLU(),
            torch.nn.Linear(C, code_size),
        )
        # reference shares one module across layers (`petr_head.py:244-247`)
        self.cls_branches = torch.nn.ModuleList([cls_branch] * num_layers)
        self.reg_branches = torch.nn.ModuleList([reg_branch] * num_layers)
        self.adapt_pos3d = torch.nn.Sequential(
            torch.nn.Conv2d(C * 3 // 2, C * 4, 1), torch.nn.ReLU(), torch.nn.Conv2d(C * 4, C, 1)
        )
        self.position_encoder = torch.nn.Sequential(
            torch.nn.Conv2d(3 * D, C * 4, 1), torch.nn.ReLU(), torch.nn.Conv2d(C * 4, C, 1)
        )
        self.reference_points = torch.nn.Embedding(Q, 3)
        self.query_embedding = torch.nn.Sequential(
            torch.nn.Linear(C * 3 // 2, C), torch.nn.ReLU(), torch.nn.Linear(C, C)
        )
        self.transformer = TorchTransformer(num_layers, C, heads, F)

    def position_embeding(self, feats, img2lidar, pad_hw):
        eps = 1e-5
        B, N, _, H, W = feats.shape
        pad_h, pad_w = pad_hw
        coords_h = torch.arange(H).float() * pad_h / H
        coords_w = torch.arange(W).float() * pad_w / W
        index = torch.arange(self.D).float()
        bin_size = (self.position_range[3] - self.depth_start) / (self.D * (1 + self.D))
        coords_d = self.depth_start + bin_size * index * (index + 1)
        coords = torch.stack(
            torch.meshgrid([coords_w, coords_h, coords_d], indexing="ij")
        ).permute(1, 2, 3, 0)  # (W, H, D, 3)
        coords = torch.cat((coords, torch.ones_like(coords[..., :1])), -1)
        coords[..., :2] = coords[..., :2] * torch.maximum(
            coords[..., 2:3], torch.ones_like(coords[..., 2:3]) * eps
        )
        i2l = img2lidar.view(B, N, 1, 1, 1, 4, 4)
        coords3d = torch.matmul(i2l, coords.view(1, 1, *coords.shape, 1)).squeeze(-1)[..., :3]
        for a in range(3):
            lo, hi = self.position_range[a], self.position_range[a + 3]
            coords3d[..., a] = (coords3d[..., a] - lo) / (hi - lo)
        coords3d = coords3d.permute(0, 1, 4, 5, 3, 2).contiguous().view(B * N, -1, H, W)
        coords3d = t_inverse_sigmoid(coords3d)
        pe = self.position_encoder(coords3d)
        return pe.view(B, N, self.C, H, W)

    def forward(self, feats, img2lidar, img_hw, pad_hw):
        B, N, _, H, W = feats.shape
        pad_h, pad_w = pad_hw
        masks = feats.new_ones((B, N, pad_h, pad_w))
        for b in range(B):
            for n in range(N):
                h, w = int(img_hw[b, n, 0]), int(img_hw[b, n, 1])
                masks[b, n, :h, :w] = 0
        x = self.input_proj(feats.flatten(0, 1)).view(B, N, self.C, H, W)
        masks = torch.nn.functional.interpolate(masks, size=(H, W)).to(torch.bool)

        pos_embed = self.position_embeding(feats, img2lidar, pad_hw)
        sin_embed = t_sine_pe_3d(masks, self.C // 2)
        sin_embed = self.adapt_pos3d(sin_embed.flatten(0, 1)).view(x.size())
        pos_embed = pos_embed + sin_embed

        ref = self.reference_points.weight
        query_embeds = self.query_embedding(t_pos2posemb3d(ref))  # (Q, C)
        reference_points = ref.unsqueeze(0).repeat(B, 1, 1)

        memory = x.permute(0, 1, 3, 4, 2).reshape(B, -1, self.C)  # (B, N*H*W, C)
        pos_flat = pos_embed.permute(0, 1, 3, 4, 2).reshape(B, -1, self.C)
        mask_flat = masks.view(B, -1)
        target = torch.zeros(B, ref.shape[0], self.C)
        qp = query_embeds.unsqueeze(0).repeat(B, 1, 1)

        outs_dec = self.transformer.decoder(target, memory, qp, pos_flat, mask_flat)
        outs_dec = torch.nan_to_num(outs_dec)

        cls_list, reg_list = [], []
        reference = t_inverse_sigmoid(reference_points.clone())
        for lvl in range(outs_dec.shape[0]):
            tmp = self.reg_branches[lvl](outs_dec[lvl])
            tmp[..., 0:2] = (tmp[..., 0:2] + reference[..., 0:2]).sigmoid()
            tmp[..., 4:5] = (tmp[..., 4:5] + reference[..., 2:3]).sigmoid()
            cls_list.append(self.cls_branches[lvl](outs_dec[lvl]))
            reg_list.append(tmp)
        all_cls = torch.stack(cls_list)
        all_reg = torch.stack(reg_list)
        pr = self.pc_range
        all_reg[..., 0:1] = all_reg[..., 0:1] * (pr[3] - pr[0]) + pr[0]
        all_reg[..., 1:2] = all_reg[..., 1:2] * (pr[4] - pr[1]) + pr[1]
        all_reg[..., 4:5] = all_reg[..., 4:5] * (pr[5] - pr[2]) + pr[2]
        return all_cls, all_reg


# ----------------------------------------------------------------- the test
def test_petr_head_matches_torch_reconstruction_via_converter():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    B, N, H, W, Cin = 1, 2, 6, 10, 32
    C, heads, F, L, Q, ncls, D = 256, 8, 128, 2, 24, 10, 8
    pad_hw = (48, 80)
    position_range = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    pc_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)

    tmodel = TorchPETRHead(
        Cin, C, heads, F, L, Q, ncls, D, 10, position_range, pc_range
    ).eval()
    with torch.no_grad():
        torch.nn.init.uniform_(tmodel.reference_points.weight, 0, 1)

    feats = rng.randn(B, N, H, W, Cin).astype(np.float32)
    from tests.test_heads import make_cams

    img2lidar = make_cams(B, N, seed=1).astype(np.float32)
    img_hw = np.array([[[48, 80], [40, 64]]], np.float32)  # second view padded

    with torch.no_grad():
        ref_cls, ref_reg = tmodel(
            torch.from_numpy(feats.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(img2lidar),
            torch.from_numpy(img_hw),
            pad_hw,
        )

    ours = PETRHead(
        num_classes=ncls, in_channels=Cin, embed_dim=C, num_query=Q,
        num_layers=L, num_heads=heads, ffn_dim=F, depth_num=D,
        position_range=position_range, pc_range=pc_range,
        dropout_rate=0.0, remat=False,
    )
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(img2lidar),
        jnp.asarray(img_hw), pad_hw,
    )["params"]

    sd = {f"pts_bbox_head.{k}": v.detach().numpy() for k, v in tmodel.state_dict().items()}
    new_params, stats = convert_state_dict(sd, {"head": params})
    assert stats["skipped"] == 0, "unmapped torch keys"
    assert stats["unfilled"] == 0, "target leaves not covered"

    out = ours.apply(
        {"params": new_params["head"]}, jnp.asarray(feats), jnp.asarray(img2lidar),
        jnp.asarray(img_hw), pad_hw,
    )
    np.testing.assert_allclose(
        np.asarray(out["cls_logits"]), ref_cls.numpy(), rtol=2e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["bbox_codes"]), ref_reg.numpy(), rtol=2e-4, atol=5e-4
    )


def test_petr_head_gradients_match_torch():
    """Backward parity: d(sum of outputs)/d(features) through the full head
    (decoder, 3D PE path, branches) matches torch autograd on the
    reconstruction — pins the training-path math, not just the forward."""
    torch.manual_seed(3)
    rng = np.random.RandomState(3)
    B, N, H, W, Cin = 1, 2, 4, 6, 16
    C, heads, F, L, Q, ncls, D = 256, 8, 64, 2, 12, 10, 4
    pad_hw = (32, 48)
    position_range = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    pc_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)

    tmodel = TorchPETRHead(
        Cin, C, heads, F, L, Q, ncls, D, 10, position_range, pc_range
    ).eval()
    with torch.no_grad():
        torch.nn.init.uniform_(tmodel.reference_points.weight, 0, 1)

    feats = rng.randn(B, N, H, W, Cin).astype(np.float32)
    from tests.test_heads import make_cams

    img2lidar = make_cams(B, N, seed=2).astype(np.float32)
    img_hw = np.full((B, N, 2), [32, 48], np.float32)

    tfeats = torch.from_numpy(feats.transpose(0, 1, 4, 2, 3)).requires_grad_(True)
    ref_cls, ref_reg = tmodel(
        tfeats, torch.from_numpy(img2lidar), torch.from_numpy(img_hw), pad_hw
    )
    # velocity/size dims are unbounded; weight the scalar to keep grads O(1)
    scalar = ref_cls.sum() * 0.1 + ref_reg[..., 0:2].sum()
    scalar.backward()
    want = tfeats.grad.numpy().transpose(0, 1, 3, 4, 2)

    ours = PETRHead(
        num_classes=ncls, in_channels=Cin, embed_dim=C, num_query=Q,
        num_layers=L, num_heads=heads, ffn_dim=F, depth_num=D,
        position_range=position_range, pc_range=pc_range,
        dropout_rate=0.0, remat=False,
    )
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(img2lidar),
        jnp.asarray(img_hw), pad_hw,
    )["params"]
    sd = {f"pts_bbox_head.{k}": v.detach().numpy() for k, v in tmodel.state_dict().items()}
    new_params, stats = convert_state_dict(sd, {"head": params})
    assert stats["skipped"] == 0 and stats["unfilled"] == 0

    def scalar_fn(f):
        out = ours.apply(
            {"params": new_params["head"]}, f, jnp.asarray(img2lidar),
            jnp.asarray(img_hw), pad_hw,
        )
        return (out["cls_logits"].sum() * 0.1 + out["bbox_codes"][..., 0:2].sum())

    got = np.asarray(jax.grad(scalar_fn)(jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)
