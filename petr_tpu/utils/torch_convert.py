"""Import reference torch checkpoints into petr_tpu param trees.

A pure key-map + layout transpose (torch OIHW conv -> flax HWIO; Linear
(out,in) -> kernel (in,out); packed MHA in_proj -> split q/k/v). The module
layouts were designed for 1:1 mapping (see model docstrings), so this is
mechanical. Covers: VoVNet(CP), mmdet ResNet (incl. DCN offsets), CPFPN,
PETRHead / PETRv2Head, PETR transformer decoder.

Legacy-key remapping (`petr_head.py:336-364` in the reference: .self_attn. ->
.attentions.0. etc.) is applied first, so both old and new released
checkpoints load.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _lin_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    # (O, I, 1, 1) -> (I, O)
    return np.transpose(w[:, :, 0, 0], (1, 0))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.float().numpy()
    return out


LEGACY_MAP = {
    ".self_attn.": ".attentions.0.",
    ".multihead_attn.": ".attentions.1.",
    ".decoder.norm.": ".decoder.post_norm.",
}


def _apply_legacy(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for old, new in LEGACY_MAP.items():
            if old in k:
                k = k.replace(old, new)
        out[k] = v
    return out


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray, strict: bool):
    node = tree
    for p in path[:-1]:
        if p not in node:
            if strict:
                raise KeyError(f"missing subtree {path}")
            return False
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        if strict:
            raise KeyError(f"missing leaf {path}")
        return False
    if node[leaf].shape != value.shape:
        raise ValueError(f"shape mismatch at {path}: {node[leaf].shape} vs {value.shape}")
    node[leaf] = value.astype(np.float32)
    return True


_BN_LEAF = {"weight": "scale", "bias": "bias", "running_mean": "mean", "running_var": "var"}


def _map_vovnet(key: str):
    """img_backbone.* (VoVNet/VoVNetCP) -> backbone.*"""
    # stem: stem.stem_{i}/conv|norm
    m = re.match(r"stem\.stem_(\d)/(conv|norm)\.(\w+)", key)
    if m:
        i, kind, leaf = m.groups()
        mod = ("conv", "kernel") if kind == "conv" else ("bn", _BN_LEAF[leaf])
        return (f"stem{i}", mod[0], mod[1] if kind == "norm" else "kernel"), kind == "conv"
    # stages: stage{s}.OSA{s}_{b}.layers.{i}.OSA{s}_{b}_{i}/conv|norm.*
    m = re.match(r"stage(\d)\.OSA\d_(\d+)\.layers\.(\d+)\..*?/(conv|norm)\.(\w+)", key)
    if m:
        s, b, i, kind, leaf = m.groups()
        block = f"stage{s}_block{int(b) - 1}"
        sub = f"conv{i}"
        if kind == "conv":
            return (block, sub, "conv", "kernel"), True
        return (block, sub, "bn", _BN_LEAF[leaf]), False
    # concat conv
    m = re.match(r"stage(\d)\.OSA\d_(\d+)\.concat\..*?/(conv|norm)\.(\w+)", key)
    if m:
        s, b, kind, leaf = m.groups()
        block = f"stage{s}_block{int(b) - 1}"
        if kind == "conv":
            return (block, "concat", "conv", "kernel"), True
        return (block, "concat", "bn", _BN_LEAF[leaf]), False
    # ese
    m = re.match(r"stage(\d)\.OSA\d_(\d+)\.ese\.fc\.(weight|bias)", key)
    if m:
        s, b, leaf = m.groups()
        block = f"stage{s}_block{int(b) - 1}"
        return (block, "ese", "fc", "kernel" if leaf == "weight" else "bias"), leaf == "weight"
    return None, False


def _map_resnet(key: str):
    """mmdet ResNet keys -> backbone.*"""
    m = re.match(r"conv1\.(weight)", key)
    if m:
        return ("stem_conv", "kernel"), True
    m = re.match(r"bn1\.(\w+)", key)
    if m and m.group(1) in _BN_LEAF:
        return ("stem_bn", _BN_LEAF[m.group(1)]), False
    # mmcv ModulatedDeformConv2dPack stores its offset/mask predictor as a
    # `conv_offset` submodule of conv2 (keys `layerX.Y.conv2.conv_offset.*`);
    # older mmdet variants used a sibling `conv2_offset` module. Accept both.
    m = re.match(
        r"layer(\d)\.(\d+)\.(?:conv2\.conv_offset|conv2_offset)\.(weight|bias)$", key
    )
    if m:
        stage, block, leaf = m.groups()
        name = f"layer{stage}_block{block}"
        return (name, "conv2_offset", "kernel" if leaf == "weight" else "bias"), leaf == "weight"
    m = re.match(r"layer(\d)\.(\d+)\.(conv\d|bn\d)\.(\w+)$", key)
    if m:
        stage, block, mod, leaf = m.groups()
        name = f"layer{stage}_block{block}"
        if mod.startswith("conv"):
            if mod == "conv2":
                # may be a plain conv or DCN weight
                return (name, "conv2", "kernel"), True
            return (name, mod, "kernel"), True
        if leaf in _BN_LEAF:
            return (name, mod, _BN_LEAF[leaf]), False
        return None, False
    m = re.match(r"layer(\d)\.(\d+)\.downsample\.(0|1)\.(\w+)", key)
    if m:
        stage, block, idx, leaf = m.groups()
        name = f"layer{stage}_block{block}"
        if idx == "0":
            return (name, "downsample_conv", "kernel"), True
        if leaf in _BN_LEAF:
            return (name, "downsample_bn", _BN_LEAF[leaf]), False
    return None, False


def _map_neck(key: str):
    m = re.match(r"lateral_convs\.(\d+)\.conv\.(weight|bias)", key)
    if m:
        i, leaf = m.groups()
        return (f"lateral{i}", "kernel" if leaf == "weight" else "bias"), leaf == "weight"
    m = re.match(r"fpn_convs\.0\.conv\.(weight|bias)", key)
    if m:
        leaf = m.group(1)
        return ("fpn_conv0", "kernel" if leaf == "weight" else "bias"), leaf == "weight"
    return None, False


def _seq_to_named(idx: int, pattern: str) -> Tuple[str, ...]:
    """Map torch Sequential indices to our named submodules."""
    if pattern == "cls":  # Linear, LN, ReLU, Linear, LN, ReLU, Linear
        return {0: ("fc0",), 1: ("ln0",), 3: ("fc1",), 4: ("ln1",), 6: ("out",)}[idx]
    if pattern == "reg":  # Linear, ReLU, Linear, ReLU, Linear
        return {0: ("fc0",), 2: ("fc1",), 4: ("out",)}[idx]
    if pattern == "mlp2":  # Conv/Linear, ReLU, Conv/Linear
        return {0: ("fc0",), 2: ("fc1",)}[idx]
    if pattern == "posenc":  # Conv, ReLU, Conv -> fc1/fc2
        return {0: ("fc1",), 2: ("fc2",)}[idx]
    raise KeyError((idx, pattern))


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    params: Dict[str, Any],
    shared_branches: bool = True,
    verbose: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, int]]:
    """Translate a reference checkpoint into a (copy of) our param tree.

    Returns (new_params, stats). Unmatched reference keys and unfilled target
    leaves are counted; callers assert on them for full-coverage imports.
    """
    import copy

    sd = _apply_legacy(sd)
    params = copy.deepcopy(
        {k: (dict(v) if isinstance(v, dict) else v) for k, v in params.items()}
    )
    # deep copy as plain nested dict of np arrays
    import jax

    params = jax.tree.map(np.asarray, params)

    filled = set()
    stats = {"matched": 0, "skipped": 0}

    def put(path, value, is_conv=False, is_lin=False, is_c1=False):
        v = value
        if is_conv:
            v = _conv_w(v)
        elif is_lin:
            v = _lin_w(v)
        elif is_c1:
            v = _conv1x1_to_dense(v)
        _set(params, path, v, strict=True)
        filled.add(path)
        stats["matched"] += 1

    for key, val in sd.items():
        try:
            if key.startswith("img_backbone."):
                sub = key[len("img_backbone.") :]
                mapped, is_conv = _map_vovnet(sub)
                if mapped is None:
                    mapped, is_conv = _map_resnet(sub)
                if mapped is not None:
                    try:
                        put(("backbone",) + tuple(mapped), val, is_conv=is_conv)
                    except KeyError:
                        if tuple(mapped[-2:]) != ("conv2", "kernel"):
                            raise
                        # DCN bottleneck: conv2 is the raw `conv2_weight`
                        # kernel param, not an nn.Conv submodule
                        put(
                            ("backbone",) + tuple(mapped[:-2]) + ("conv2_weight",),
                            val, is_conv=True,
                        )
                    continue
            if key.startswith("img_neck."):
                mapped, is_conv = _map_neck(key[len("img_neck.") :])
                if mapped is not None:
                    put(("neck",) + tuple(mapped), val, is_conv=is_conv)
                    continue
            if key.startswith("pts_bbox_head."):
                if _map_head(key[len("pts_bbox_head.") :], val, put, shared_branches):
                    continue
            stats["skipped"] += 1
            if verbose:
                print("skip:", key)
        except (KeyError, ValueError) as e:
            stats["skipped"] += 1
            if verbose:
                print(f"FAIL {key}: {e}")

    stats["unfilled"] = _count_unfilled(params, filled)
    return params, stats


def _map_head(key: str, val: np.ndarray, put, shared_branches: bool) -> bool:
    H = ("head",)
    m = re.match(r"input_proj\.(weight|bias)", key)
    if m:
        leaf = m.group(1)
        put(H + ("input_proj", "kernel" if leaf == "weight" else "bias"), val,
            is_c1=leaf == "weight")
        return True
    # PETRv2 RegLayer: shared trunk Sequential(Linear, ReLU, Dropout)*n ->
    # fc{i}; task heads Sequential(Linear, ReLU, Linear) -> task{g}_fc/_out
    m = re.match(r"reg_branches\.(\d+)\.reg_branch\.(\d+)\.(weight|bias)", key)
    if m:
        lvl, idx, leaf = m.groups()
        if shared_branches and lvl != "0":
            return True
        suffix = "" if shared_branches else f"_{lvl}"
        fc = f"fc{int(idx) // 3}"  # torch Sequential stride 3 (Linear,ReLU,Drop)
        put(H + (f"reg_branch{suffix}", fc, "kernel" if leaf == "weight" else "bias"),
            val, is_lin=leaf == "weight")
        return True
    m = re.match(r"reg_branches\.(\d+)\.task_heads\.(\d+)\.(0|2)\.(weight|bias)", key)
    if m:
        lvl, g, idx, leaf = m.groups()
        if shared_branches and lvl != "0":
            return True
        suffix = "" if shared_branches else f"_{lvl}"
        sub = f"task{g}_fc" if idx == "0" else f"task{g}_out"
        put(H + (f"reg_branch{suffix}", sub, "kernel" if leaf == "weight" else "bias"),
            val, is_lin=leaf == "weight")
        return True
    m = re.match(r"(cls|reg)_branches\.(\d+)\.(\d+)\.(weight|bias)", key)
    if m:
        kind, lvl, idx, leaf = m.groups()
        if shared_branches and lvl != "0":
            return True  # same module repeated; take layer 0 only
        suffix = "" if shared_branches else f"_{lvl}"
        name = f"{kind}_branch{suffix}"
        sub = _seq_to_named(int(idx), "cls" if kind == "cls" else "reg")
        is_lin = leaf == "weight" and "ln" not in sub[0]
        leaf_name = "kernel" if (leaf == "weight" and "ln" not in sub[0]) else (
            "scale" if leaf == "weight" else "bias"
        )
        put(H + (name,) + sub + (leaf_name,), val, is_lin=is_lin)
        return True
    m = re.match(r"adapt_pos3d\.(\d)\.(weight|bias)", key)
    if m:
        idx, leaf = m.groups()
        sub = _seq_to_named(int(idx), "mlp2")
        put(H + ("adapt_pos3d",) + sub + ("kernel" if leaf == "weight" else "bias",),
            val, is_c1=leaf == "weight")
        return True
    m = re.match(r"position_encoder\.(\d)\.(weight|bias)", key)
    if m:
        idx, leaf = m.groups()
        sub = _seq_to_named(int(idx), "posenc")
        put(H + ("position_encoder",) + sub + ("kernel" if leaf == "weight" else "bias",),
            val, is_c1=leaf == "weight")
        return True
    m = re.match(r"query_embedding\.(\d)\.(weight|bias)", key)
    if m:
        idx, leaf = m.groups()
        sub = _seq_to_named(int(idx), "mlp2")
        put(H + ("query_embedding",) + sub + ("kernel" if leaf == "weight" else "bias",),
            val, is_lin=leaf == "weight")
        return True
    if key == "reference_points.weight":
        put(H + ("reference_points",), val)
        return True
    # fpe (PETRv2 SELayer)
    m = re.match(r"fpe\.conv_(reduce|expand)\.(weight|bias)", key)
    if m:
        which, leaf = m.groups()
        put(H + ("fpe", f"conv_{which}", "kernel" if leaf == "weight" else "bias"),
            val, is_conv=leaf == "weight")
        return True
    # transformer decoder
    m = re.match(r"transformer\.decoder\.post_norm\.(weight|bias)", key)
    if m:
        leaf = m.group(1)
        put(H + ("transformer", "decoder", "post_norm", "scale" if leaf == "weight" else "bias"), val)
        return True
    m = re.match(
        r"transformer\.decoder\.layers\.(\d+)\.attentions\.([01])\.attn\.(.*)", key
    )
    if m:
        lvl, att, rest = m.groups()
        layer = ("transformer", "decoder", f"layer{lvl}", "self_attn" if att == "0" else "cross_attn")
        C = val.shape[-1] if val.ndim else val.shape[0]
        if rest == "in_proj_weight":
            C = val.shape[1]
            for i, proj in enumerate(("q_proj", "k_proj", "v_proj")):
                put(H + layer + (proj, "kernel"), val[i * C : (i + 1) * C], is_lin=True)
            return True
        if rest == "in_proj_bias":
            C = val.shape[0] // 3
            for i, proj in enumerate(("q_proj", "k_proj", "v_proj")):
                put(H + layer + (proj, "bias"), val[i * C : (i + 1) * C])
            return True
        if rest == "out_proj.weight":
            put(H + layer + ("out_proj", "kernel"), val, is_lin=True)
            return True
        if rest == "out_proj.bias":
            put(H + layer + ("out_proj", "bias"), val)
            return True
    m = re.match(
        r"transformer\.decoder\.layers\.(\d+)\.ffns\.0\.layers\.(0\.0|1)\.(weight|bias)", key
    )
    if m:
        lvl, which, leaf = m.groups()
        fc = "fc1" if which == "0.0" else "fc2"
        put(
            H + ("transformer", "decoder", f"layer{lvl}", "ffn", fc,
                 "kernel" if leaf == "weight" else "bias"),
            val, is_lin=leaf == "weight",
        )
        return True
    m = re.match(r"transformer\.decoder\.layers\.(\d+)\.norms\.(\d)\.(weight|bias)", key)
    if m:
        lvl, idx, leaf = m.groups()
        put(
            H + ("transformer", "decoder", f"layer{lvl}", f"norm{int(idx) + 1}",
                 "scale" if leaf == "weight" else "bias"),
            val,
        )
        return True
    return False


def _count_unfilled(params, filled) -> int:
    import jax

    count = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        tup = tuple(p.key for p in path)
        if tup not in filled:
            count += 1
    return count
