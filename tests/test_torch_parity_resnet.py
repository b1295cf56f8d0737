"""ResNet-50 backbone numerical parity + an independent DCNv2 oracle.

1. A from-scratch torch ResNet-50 with mmdet 'caffe' semantics (stride on the
   bottleneck's first 1x1 conv — reference config
   `projects/configs/petr/petr_r50dcn_gridmask_p4.py:31-44` uses upstream
   mmdet ResNet style='caffe') and mmdet's state_dict key conventions,
   imported through `utils.torch_convert`, must match our flax ResNet to
   float32 precision. Validates stem/bottleneck/downsample math AND the
   checkpoint key map numerically in one shot.

2. A plain-NumPy modulated-deformable-conv oracle (mmcv DCNv2 semantics:
   interleaved (dy, dx) tap offsets + sigmoid mask, zero outside borders)
   checks `ops/dcn.py`'s XLA gather formulation independently — until now it
   was only cross-checked against the Pallas kernel, which shares its
   conventions by construction.
"""

from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp
import torch

from petr_tpu.models.resnet import ResNet
from petr_tpu.ops.dcn import modulated_deform_conv
from petr_tpu.utils.torch_convert import convert_state_dict


class TorchBottleneckCaffe(torch.nn.Module):
    """mmdet caffe-style bottleneck: stride on conv1 (1x1)."""

    def __init__(self, cin, mid, out, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, mid, 1, stride, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(mid)
        self.conv2 = torch.nn.Conv2d(mid, mid, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(mid)
        self.conv3 = torch.nn.Conv2d(mid, out, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(out)
        if stride != 1 or cin != out:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, out, 1, stride, bias=False),
                torch.nn.BatchNorm2d(out),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idt)


class TorchResNet50Caffe(torch.nn.Module):
    def __init__(self, out_indices=(0, 1, 2, 3)):
        super().__init__()
        self.out_indices = out_indices
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        cin = 64
        for stage, (blocks, mid) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512))):
            out = mid * 4
            mods = OrderedDict()
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                mods[str(b)] = TorchBottleneckCaffe(cin, mid, out, stride)
                cin = out
            self.add_module(f"layer{stage + 1}", torch.nn.Sequential(mods))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        outs = []
        for stage in range(4):
            x = getattr(self, f"layer{stage + 1}")(x)
            if stage in self.out_indices:
                outs.append(x)
        return outs


def test_resnet50_caffe_matches_torch_reconstruction_via_converter():
    torch.manual_seed(0)
    tmodel = TorchResNet50Caffe().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)

    ours = ResNet(depth=50, out_indices=(0, 1, 2, 3), dcn_stages=(), remat_stages=False)
    x = np.random.RandomState(0).randn(1, 3, 64, 96).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))["params"]

    sd = {f"img_backbone.{k}": v.detach().numpy() for k, v in tmodel.state_dict().items()
          if "num_batches_tracked" not in k}
    new_params, stats = convert_state_dict(sd, {"backbone": params})
    assert stats["skipped"] == 0, "unmapped torch keys"
    assert stats["unfilled"] == 0, "target leaves not covered"

    with torch.no_grad():
        ref = [o.numpy() for o in tmodel(torch.from_numpy(x))]
    got = ours.apply({"params": new_params["backbone"]}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), r, rtol=1e-4, atol=1e-4
        )


def _dcn_oracle_np(x, off_mask, w, stride):
    """Loop-and-gather NumPy DCNv2 (mmcv semantics)."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = w.shape
    K = kh * kw
    _, Ho, Wo, _ = off_mask.shape
    pad_h, pad_w = (kh - 1) // 2, (kw - 1) // 2
    mask = 1.0 / (1.0 + np.exp(-off_mask[..., 2 * K:]))
    out = np.zeros((B, Ho, Wo, Cout), np.float64)

    def sample(img, y, xx):
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        wy, wx = y - y0, xx - x0
        acc = np.zeros(img.shape[-1], np.float64)
        for (yi, xi, wgt) in (
            (y0, x0, (1 - wy) * (1 - wx)),
            (y0, x0 + 1, (1 - wy) * wx),
            (y0 + 1, x0, wy * (1 - wx)),
            (y0 + 1, x0 + 1, wy * wx),
        ):
            if 0 <= yi < H and 0 <= xi < W:
                acc += wgt * img[yi, xi]
        return acc

    for b in range(B):
        for i in range(Ho):
            for j in range(Wo):
                for k in range(K):
                    ky, kx = k // kw, k % kw
                    sy = i * stride + ky - pad_h + off_mask[b, i, j, 2 * k]
                    sx = j * stride + kx - pad_w + off_mask[b, i, j, 2 * k + 1]
                    v = sample(x[b], sy, sx) * mask[b, i, j, k]
                    out[b, i, j] += v @ w[ky, kx]
    return out.astype(np.float32)


def test_modulated_deform_conv_vs_numpy_oracle():
    rng = np.random.RandomState(3)
    for stride in (1, 2):
        H, W = 7, 8
        x = rng.randn(2, H, W, 4).astype(np.float32)
        Ho, Wo = H // stride, W // stride
        off_mask = (rng.randn(2, Ho, Wo, 27) * 1.5).astype(np.float32)
        w = (rng.randn(3, 3, 4, 6) * 0.3).astype(np.float32)
        ref = _dcn_oracle_np(x, off_mask, w, stride)
        got = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(off_mask), jnp.asarray(w), stride=stride
        ))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
