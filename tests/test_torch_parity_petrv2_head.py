"""Full PETRv2-head numerical parity: torch reconstruction of the reference
v2 forward (`models/dense_heads/petrv2_head.py:429-530`) — FPE SELayer gating
of the 3D PE (`:48-60,464-466`), grouped RegLayer regression (`:63-95`),
deep-copied per-layer branches (`:304-307`), with_time velocity normalization
by the mean inter-frame timestamp delta (`:499-521`) — imported through
`utils.torch_convert` with shared_branches=False, must match our flax
PETRv2Head to fp32 precision over 12 cameras (2 frames).
"""

import copy

import numpy as np
import torch
import jax
import jax.numpy as jnp

from petr_tpu.models.petrv2_head import PETRv2Head
from petr_tpu.utils.torch_convert import convert_state_dict
from tests.test_torch_parity_head import (
    TorchPETRHead,
    t_pos2posemb3d,
    t_sine_pe_3d,
    t_inverse_sigmoid,
)


class TorchSELayer(torch.nn.Module):
    def __init__(self, C):
        super().__init__()
        self.conv_reduce = torch.nn.Conv2d(C, C, 1, bias=True)
        self.conv_expand = torch.nn.Conv2d(C, C, 1, bias=True)

    def forward(self, x, x_se):
        g = self.conv_expand(torch.relu(self.conv_reduce(x_se)))
        return x * torch.sigmoid(g)


class TorchRegLayer(torch.nn.Module):
    def __init__(self, C, shared_reg_fcs=2, group_reg_dims=(2, 1, 3, 2, 2)):
        super().__init__()
        trunk = []
        for _ in range(shared_reg_fcs):
            trunk += [torch.nn.Linear(C, C), torch.nn.ReLU(), torch.nn.Dropout(0.0)]
        self.reg_branch = torch.nn.Sequential(*trunk)
        self.task_heads = torch.nn.ModuleList(
            [
                torch.nn.Sequential(torch.nn.Linear(C, C), torch.nn.ReLU(), torch.nn.Linear(C, d))
                for d in group_reg_dims
            ]
        )

    def forward(self, x):
        feat = self.reg_branch(x)
        return torch.cat([head(feat) for head in self.task_heads], -1)


class TorchPETRv2Head(TorchPETRHead):
    """v2 deltas over the PETR head reconstruction: FPE, RegLayer groups,
    deep-copied branches, with_time."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        C = self.C
        num_layers = len(self.cls_branches)
        # deep-copied (not shared) branches, grouped regression
        self.cls_branches = torch.nn.ModuleList(
            [copy.deepcopy(self.cls_branches[0]) for _ in range(num_layers)]
        )
        reg = TorchRegLayer(C)
        self.reg_branches = torch.nn.ModuleList(
            [copy.deepcopy(reg) for _ in range(num_layers)]
        )
        self.fpe = TorchSELayer(C)

    def forward(self, feats, img2lidar, img_hw, pad_hw, timestamp):
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
        pos_embed = self.fpe(pos_embed.flatten(0, 1), x.flatten(0, 1)).view(x.size())
        sin_embed = t_sine_pe_3d(masks, self.C // 2)
        sin_embed = self.adapt_pos3d(sin_embed.flatten(0, 1)).view(x.size())
        pos_embed = pos_embed + sin_embed

        ref = self.reference_points.weight
        query_embeds = self.query_embedding(t_pos2posemb3d(ref))
        reference_points = ref.unsqueeze(0).repeat(B, 1, 1)

        memory = x.permute(0, 1, 3, 4, 2).reshape(B, -1, self.C)
        pos_flat = pos_embed.permute(0, 1, 3, 4, 2).reshape(B, -1, self.C)
        mask_flat = masks.view(B, -1)
        target = torch.zeros(B, ref.shape[0], self.C)
        qp = query_embeds.unsqueeze(0).repeat(B, 1, 1)

        outs_dec = self.transformer.decoder(target, memory, qp, pos_flat, mask_flat)
        outs_dec = torch.nan_to_num(outs_dec)

        ts = timestamp.view(B, -1, 6)
        mean_dt = (ts[:, 1, :] - ts[:, 0, :]).mean(-1)  # (B,)

        cls_list, reg_list = [], []
        reference = t_inverse_sigmoid(reference_points.clone())
        for lvl in range(outs_dec.shape[0]):
            tmp = self.reg_branches[lvl](outs_dec[lvl])
            tmp[..., 0:2] = (tmp[..., 0:2] + reference[..., 0:2]).sigmoid()
            tmp[..., 4:5] = (tmp[..., 4:5] + reference[..., 2:3]).sigmoid()
            tmp[..., 8:] = tmp[..., 8:] / mean_dt[:, None, None]
            cls_list.append(self.cls_branches[lvl](outs_dec[lvl]))
            reg_list.append(tmp)
        all_cls = torch.stack(cls_list)
        all_reg = torch.stack(reg_list)
        pr = self.pc_range
        all_reg[..., 0:1] = all_reg[..., 0:1] * (pr[3] - pr[0]) + pr[0]
        all_reg[..., 1:2] = all_reg[..., 1:2] * (pr[4] - pr[1]) + pr[1]
        all_reg[..., 4:5] = all_reg[..., 4:5] * (pr[5] - pr[2]) + pr[2]
        return all_cls, all_reg


def test_petrv2_head_matches_torch_reconstruction_via_converter():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    B, N, H, W, Cin = 1, 12, 4, 6, 16  # 2 frames x 6 cams
    C, heads, F, L, Q, ncls, D = 256, 8, 128, 2, 16, 10, 4
    pad_hw = (32, 48)
    position_range = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    pc_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)

    tmodel = TorchPETRv2Head(
        Cin, C, heads, F, L, Q, ncls, D, 10, position_range, pc_range
    ).eval()
    with torch.no_grad():
        torch.nn.init.uniform_(tmodel.reference_points.weight, 0, 1)

    feats = rng.randn(B, N, H, W, Cin).astype(np.float32)
    from tests.test_heads import make_cams

    img2lidar = make_cams(B, N, seed=1).astype(np.float32)
    img_hw = np.tile(np.array([[32, 48]], np.float32), (B * N, 1)).reshape(B, N, 2)
    img_hw[0, 1] = (24, 40)  # one padded view
    # reference sign: prev frame deltas POSITIVE (lidar - img)
    timestamp = np.concatenate(
        [np.zeros((B, 6), np.float32), np.full((B, 6), 0.5, np.float32)], axis=1
    )

    with torch.no_grad():
        ref_cls, ref_reg = tmodel(
            torch.from_numpy(feats.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(img2lidar),
            torch.from_numpy(img_hw),
            pad_hw,
            torch.from_numpy(timestamp),
        )

    ours = PETRv2Head(
        num_classes=ncls, in_channels=Cin, embed_dim=C, num_query=Q,
        num_layers=L, num_heads=heads, ffn_dim=F, depth_num=D,
        position_range=position_range, pc_range=pc_range,
        dropout_rate=0.0, remat=False, shared_branches=False,
    )
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(img2lidar),
        jnp.asarray(img_hw), pad_hw, timestamp=jnp.asarray(timestamp),
    )["params"]

    sd = {f"pts_bbox_head.{k}": v.detach().numpy() for k, v in tmodel.state_dict().items()}
    new_params, stats = convert_state_dict(sd, {"head": params}, shared_branches=False)
    assert stats["skipped"] == 0, "unmapped torch keys"
    assert stats["unfilled"] == 0, "target leaves not covered"

    out = ours.apply(
        {"params": new_params["head"]}, jnp.asarray(feats), jnp.asarray(img2lidar),
        jnp.asarray(img_hw), pad_hw, timestamp=jnp.asarray(timestamp),
    )
    np.testing.assert_allclose(
        np.asarray(out["cls_logits"]), ref_cls.numpy(), rtol=2e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["bbox_codes"]), ref_reg.numpy(), rtol=2e-4, atol=5e-4
    )
