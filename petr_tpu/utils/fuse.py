"""Conv + frozen-BN folding (reference `tools/misc/fuse_conv_bn.py` capability).

With frozen statistics, BN is an affine y = x*mul + add with
mul = scale/sqrt(var+eps), add = bias - mean*mul. Folding multiplies the
preceding conv kernel's output channels by ``mul`` and adds ``add`` as a conv
bias — one fewer op at inference (XLA usually fuses this anyway; folding
additionally removes the BN params from the tree).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _is_bn(node) -> bool:
    return (
        isinstance(node, dict)
        and set(node.keys()) >= {"scale", "bias", "mean", "var"}
    )


def fold_frozen_bn(params: Dict[str, Any], eps: float = 1e-5) -> Dict[str, Any]:
    """Fold every {conv, bn} ConvBNReLU-style pair; returns a new tree where
    bn nodes become identity (scale=1, bias/mean=0, var=1) and conv gains a
    bias. Works on the ConvBNReLU naming convention (children 'conv'+'bn')
    and resnet's convN/bnN pairs."""
    import jax

    params = jax.tree.map(np.asarray, params)

    def fold_pair(conv: Dict, bn: Dict):
        # Scale folds into the kernel; the remaining shift stays as the BN
        # bias with identity statistics (our convs are bias-free, so the
        # module structure is unchanged; the multiply disappears).
        mul = bn["scale"] / np.sqrt(bn["var"] + eps)
        add = bn["bias"] - bn["mean"] * mul
        conv = dict(conv)
        conv["kernel"] = (conv["kernel"] * mul).astype(np.float32)
        ident = {
            "scale": np.ones_like(bn["scale"]),
            "bias": np.asarray(add, np.float32),
            "mean": np.zeros_like(bn["mean"]),
            "var": np.ones_like(bn["var"]),
        }
        return conv, ident

    def walk(node):
        if not isinstance(node, dict):
            return node
        node = {k: walk(v) for k, v in node.items()}
        # ConvBNReLU convention
        if "conv" in node and "bn" in node and _is_bn(node["bn"]) and "kernel" in node.get("conv", {}):
            node["conv"], node["bn"] = fold_pair(node["conv"], node["bn"])
        # resnet convN/bnN convention
        for i in ("1", "2", "3"):
            ck, bk = f"conv{i}", f"bn{i}"
            if ck in node and bk in node and _is_bn(node[bk]) and "kernel" in node.get(ck, {}):
                node[ck], node[bk] = fold_pair(node[ck], node[bk])
        if "downsample_conv" in node and "downsample_bn" in node and _is_bn(node["downsample_bn"]):
            node["downsample_conv"], node["downsample_bn"] = fold_pair(
                node["downsample_conv"], node["downsample_bn"]
            )
        if "stem_conv" in node and "stem_bn" in node and _is_bn(node["stem_bn"]):
            node["stem_conv"], node["stem_bn"] = fold_pair(node["stem_conv"], node["stem_bn"])
        return node

    return walk(dict(params))
