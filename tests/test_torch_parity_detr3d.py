"""Detr3DCrossAtten torch parity: from-scratch torch reconstruction of the
reference projective point-sampling attention
(`models/utils/detr3d_transformer.py:226-430` — denormalize refs into
pc_range, project into every camera, one F.grid_sample per (cam, level),
sigmoid attention weights masked by visibility, output projection + residual
+ reference-point MLP embedding) vs our `Detr3DCrossAtten`.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from petr_tpu.models.detr3d import Detr3DCrossAtten


def torch_detr3d_cross_atten(
    query, query_pos, feats, ref, lidar2img, img_hw, pc_range, params
):
    """Reference computation, batch-first. params: torch modules dict."""
    B, Q, C = query.shape
    N = feats[0].shape[1]
    L = len(feats)
    inp_residual = query
    q = query + query_pos
    weights = params["attention_weights"](q).view(B, 1, Q, N, 1, L)

    # feature_sampling
    pts = ref.clone()
    for a in range(3):
        pts[..., a] = pts[..., a] * (pc_range[a + 3] - pc_range[a]) + pc_range[a]
    hom = torch.cat([pts, torch.ones_like(pts[..., :1])], -1)  # (B, Q, 4)
    cam = torch.matmul(
        lidar2img.view(B, N, 1, 4, 4), hom.view(B, 1, Q, 4, 1).repeat(1, N, 1, 1, 1)
    ).squeeze(-1)
    eps = 1e-5
    mask = cam[..., 2:3] > eps
    uv = cam[..., 0:2] / torch.maximum(cam[..., 2:3], torch.ones_like(cam[..., 2:3]) * eps)
    h, w = img_hw
    uv = uv.clone()
    uv[..., 0] = uv[..., 0] / w
    uv[..., 1] = uv[..., 1] / h
    uv = (uv - 0.5) * 2
    mask = (
        mask & (uv[..., 0:1] > -1.0) & (uv[..., 0:1] < 1.0)
        & (uv[..., 1:2] > -1.0) & (uv[..., 1:2] < 1.0)
    )
    mask = mask.view(B, N, 1, Q, 1, 1).permute(0, 2, 3, 1, 4, 5).float()
    sampled = []
    for feat in feats:  # (B, N, C, H, W)
        BN = B * N
        f = feat.flatten(0, 1)
        grid = uv.view(BN, Q, 1, 2)
        # reference uses the default (align_corners=False since torch 1.3)
        s = torch.nn.functional.grid_sample(f, grid, align_corners=False)
        sampled.append(s.view(B, N, C, Q, 1).permute(0, 2, 3, 1, 4))
    out = torch.stack(sampled, -1).view(B, C, Q, N, 1, L)
    out = torch.nan_to_num(out)
    mask = torch.nan_to_num(mask)
    aw = weights.sigmoid() * mask
    out = (out * aw).sum(-1).sum(-1).sum(-1)  # (B, C, Q)
    out = out.permute(0, 2, 1)
    out = params["output_proj"](out)

    ref_clamped = ref.clamp(0, 1)
    logit = torch.log(ref_clamped.clamp(min=1e-5) / (1 - ref_clamped).clamp(min=1e-5))
    pos_feat = params["position_encoder"](logit)
    return out + inp_residual + pos_feat


def test_detr3d_cross_atten_matches_torch():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    B, N, Q, C = 1, 2, 9, 32
    pc_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    img_hw = (64.0, 96.0)

    tmods = {
        "attention_weights": torch.nn.Linear(C, N * 2 * 1),
        "output_proj": torch.nn.Linear(C, C),
        "position_encoder": torch.nn.Sequential(
            torch.nn.Linear(3, C), torch.nn.LayerNorm(C), torch.nn.ReLU(),
            torch.nn.Linear(C, C), torch.nn.LayerNorm(C), torch.nn.ReLU(),
        ),
    }
    for m in tmods.values():
        m.eval()

    query = torch.randn(B, Q, C)
    query_pos = torch.randn(B, Q, C)
    feats_t = [torch.randn(B, N, C, 8, 12), torch.randn(B, N, C, 4, 6)]
    ref = torch.rand(B, Q, 3)
    # cameras looking along +x with a plausible intrinsic
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 40.0
    K[0, 2], K[1, 2] = 48.0, 32.0
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    l2i = []
    for n in range(N):
        E = np.eye(4)
        E[:3, :3] = R
        E[1, 3] = -3.0 * n
        l2i.append(K @ E)
    lidar2img = torch.from_numpy(np.stack(l2i)[None].astype(np.float32))

    with torch.no_grad():
        want = torch_detr3d_cross_atten(
            query, query_pos, feats_t, ref, lidar2img, img_hw, pc_range, tmods
        ).numpy()

    def lin(mod):
        return {"kernel": mod.weight.detach().numpy().T, "bias": mod.bias.detach().numpy()}

    def ln(mod):
        return {"scale": mod.weight.detach().numpy(), "bias": mod.bias.detach().numpy()}

    params = {
        "attention_weights": lin(tmods["attention_weights"]),
        "output_proj": lin(tmods["output_proj"]),
        "pos_fc0": lin(tmods["position_encoder"][0]),
        "pos_ln0": ln(tmods["position_encoder"][1]),
        "pos_fc1": lin(tmods["position_encoder"][3]),
        "pos_ln1": ln(tmods["position_encoder"][4]),
    }
    ours = Detr3DCrossAtten(embed_dim=C, pc_range=pc_range, dropout_rate=0.0)
    got = ours.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(query.numpy()), jnp.asarray(query_pos.numpy()),
        [jnp.asarray(f.numpy().transpose(0, 1, 3, 4, 2)) for f in feats_t],
        jnp.asarray(ref.numpy()), jnp.asarray(lidar2img.numpy()), img_hw,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
