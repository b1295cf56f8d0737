"""Whole-detector numerical parity (PETR-r50-c5 shape): the torch ResNet-50
caffe backbone reconstruction feeding the torch PETR head reconstruction
(reference composition `models/detectors/petr3d.py:68-99` — views folded into
the batch for the backbone, C5 level straight into the head), imported as ONE
state_dict through `utils.torch_convert`, must match our `PETRDetector` to
fp32 precision.

With the backbone and head each parity-tested in isolation, this closes the
composition loop: view folding/unfolding, feature-level selection, head
in_channels wiring, and the converter routing one checkpoint across
backbone+head subtrees — the strongest released-checkpoint-free stand-in for
golden-activation tests (SURVEY.md §4).
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from petr_tpu.configs.config import BackboneConfig, HeadConfig, ModelConfig
from petr_tpu.models.detector import PETRDetector
from petr_tpu.utils.torch_convert import convert_state_dict
from tests.test_torch_parity_head import TorchPETRHead
from tests.test_torch_parity_resnet import TorchResNet50Caffe


def test_r50_c5_detector_matches_torch_composition_via_converter():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    B, N, H, W = 1, 2, 64, 96
    C, heads, F, L, Q, ncls, D = 256, 8, 128, 2, 16, 10, 8
    position_range = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    pc_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)

    tbackbone = TorchResNet50Caffe(out_indices=(3,)).eval()
    thead = TorchPETRHead(
        2048, C, heads, F, L, Q, ncls, D, 10, position_range, pc_range
    ).eval()
    with torch.no_grad():
        torch.nn.init.uniform_(thead.reference_points.weight, 0, 1)
        for m in tbackbone.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)

    images = rng.randn(B, N, H, W, 3).astype(np.float32)
    from tests.test_heads import make_cams

    img2lidar = make_cams(B, N, seed=1).astype(np.float32)
    img_hw = np.array([[[64, 96], [48, 64]]], np.float32)

    with torch.no_grad():
        x = torch.from_numpy(images.transpose(0, 1, 4, 2, 3))
        feats = tbackbone(x.flatten(0, 1))[0]  # (B*N, 2048, h, w)
        feats = feats.view(B, N, *feats.shape[1:])
        ref_cls, ref_reg = thead(
            feats, torch.from_numpy(img2lidar), torch.from_numpy(img_hw), (H, W)
        )

    cfg = ModelConfig(
        backbone=BackboneConfig(
            kind="resnet", spec="r50", out_indices=(3,), dcn_stages=(), with_fpn=False
        ),
        head=HeadConfig(
            num_query=Q, embed_dim=C, num_layers=L, num_heads=heads,
            ffn_dim=F, depth_num=D, dropout_rate=0.0,
            position_range=position_range, pc_range=pc_range,
        ),
        use_grid_mask=False,
        compute_dtype="float32",
        use_flash_attention=False,
        remat=False,
    )
    model = PETRDetector(cfg, deterministic=True)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(img2lidar),
        jnp.asarray(img_hw),
    )["params"]

    sd = {f"img_backbone.{k}": v.detach().numpy() for k, v in tbackbone.state_dict().items()
          if "num_batches_tracked" not in k}
    sd.update({f"pts_bbox_head.{k}": v.detach().numpy() for k, v in thead.state_dict().items()})
    new_params, stats = convert_state_dict(sd, params)
    assert stats["skipped"] == 0, "unmapped torch keys"
    assert stats["unfilled"] == 0, "target leaves not covered"

    out = model.apply(
        {"params": new_params}, jnp.asarray(images), jnp.asarray(img2lidar),
        jnp.asarray(img_hw),
    )
    np.testing.assert_allclose(
        np.asarray(out["cls_logits"]), ref_cls.numpy(), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["bbox_codes"]), ref_reg.numpy(), rtol=1e-3, atol=2e-3
    )
