"""Torch-checkpoint importer: synthetic reference-style state_dict round trip.

Builds a state_dict with the reference's exact key naming/layout conventions
(derived from vovnet.py/cp_fpn.py/petr_head.py/petr_transformer.py module
definitions) and checks full-coverage import into our param tree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from petr_tpu.configs.config import BackboneConfig, HeadConfig, ModelConfig
from petr_tpu.models.detector import PETRDetector
from petr_tpu.utils.torch_convert import convert_state_dict
from tests.test_heads import make_cams


def small_model():
    cfg = ModelConfig(
        backbone=BackboneConfig(kind="vovnet", spec="V-39-eSE", out_indices=(2, 3)),
        head=HeadConfig(num_query=12, embed_dim=32, num_layers=2, num_heads=4,
                        ffn_dim=64, depth_num=4),
        use_grid_mask=False,
        compute_dtype="float32",
    )
    model = PETRDetector(cfg, deterministic=True)
    B, N, H, W = 1, 2, 32, 64
    imgs = jnp.zeros((B, N, H, W, 3))
    i2l = jnp.asarray(make_cams(B, N))
    hw = jnp.full((B, N, 2), jnp.asarray([32.0, 64.0]))
    params = model.init(jax.random.PRNGKey(0), imgs, i2l, hw)["params"]
    return cfg, model, params, (imgs, i2l, hw)


def synth_torch_sd(params):
    """Reference-style keys for every leaf of our tree, with torch layouts."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv_t(k):  # HWIO -> OIHW
        return np.transpose(k, (3, 2, 0, 1))

    def lin_t(k):
        return np.transpose(k, (1, 0))

    def dense_to_c1(k):  # (I, O) -> (O, I, 1, 1)
        return np.transpose(k, (1, 0))[:, :, None, None]

    bn_inv = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}

    # --- backbone (VoVNet) ---
    bb = params["backbone"]
    for i in "123":
        st = bb[f"stem{i}"]
        sd[f"img_backbone.stem.stem_{i}/conv.weight"] = conv_t(np.asarray(st["conv"]["kernel"]))
        for ours, theirs in bn_inv.items():
            sd[f"img_backbone.stem.stem_{i}/norm.{theirs}"] = np.asarray(st["bn"][ours])
    for name, mod in bb.items():
        if not name.startswith("stage"):
            continue
        s = name[5]
        b = int(name.split("block")[1]) + 1
        osa = f"OSA{s}_{b}"
        for sub, m in mod.items():
            if sub.startswith("conv"):
                i = sub[4:]
                base = f"img_backbone.stage{s}.{osa}.layers.{i}.{osa}_{i}"
                sd[f"{base}/conv.weight"] = conv_t(np.asarray(m["conv"]["kernel"]))
                for ours, theirs in bn_inv.items():
                    sd[f"{base}/norm.{theirs}"] = np.asarray(m["bn"][ours])
            elif sub == "concat":
                base = f"img_backbone.stage{s}.{osa}.concat.{osa}_concat"
                sd[f"{base}/conv.weight"] = conv_t(np.asarray(m["conv"]["kernel"]))
                for ours, theirs in bn_inv.items():
                    sd[f"{base}/norm.{theirs}"] = np.asarray(m["bn"][ours])
            elif sub == "ese":
                sd[f"img_backbone.stage{s}.{osa}.ese.fc.weight"] = conv_t(np.asarray(m["fc"]["kernel"]))
                sd[f"img_backbone.stage{s}.{osa}.ese.fc.bias"] = np.asarray(m["fc"]["bias"])

    # --- neck ---
    nk = params["neck"]
    for name, m in nk.items():
        if name.startswith("lateral"):
            i = name[7:]
            sd[f"img_neck.lateral_convs.{i}.conv.weight"] = conv_t(np.asarray(m["kernel"]))
            sd[f"img_neck.lateral_convs.{i}.conv.bias"] = np.asarray(m["bias"])
        elif name == "fpn_conv0":
            sd["img_neck.fpn_convs.0.conv.weight"] = conv_t(np.asarray(m["kernel"]))
            sd["img_neck.fpn_convs.0.conv.bias"] = np.asarray(m["bias"])

    # --- head ---
    hd = params["head"]
    sd["pts_bbox_head.input_proj.weight"] = dense_to_c1(np.asarray(hd["input_proj"]["kernel"]))
    sd["pts_bbox_head.input_proj.bias"] = np.asarray(hd["input_proj"]["bias"])
    sd["pts_bbox_head.reference_points.weight"] = np.asarray(hd["reference_points"])

    cls = hd["cls_branch"]
    for lvl in range(2):  # shared module repeated per decoder layer
        p = f"pts_bbox_head.cls_branches.{lvl}"
        sd[f"{p}.0.weight"] = lin_t(np.asarray(cls["fc0"]["kernel"]))
        sd[f"{p}.0.bias"] = np.asarray(cls["fc0"]["bias"])
        sd[f"{p}.1.weight"] = np.asarray(cls["ln0"]["scale"])
        sd[f"{p}.1.bias"] = np.asarray(cls["ln0"]["bias"])
        sd[f"{p}.3.weight"] = lin_t(np.asarray(cls["fc1"]["kernel"]))
        sd[f"{p}.3.bias"] = np.asarray(cls["fc1"]["bias"])
        sd[f"{p}.4.weight"] = np.asarray(cls["ln1"]["scale"])
        sd[f"{p}.4.bias"] = np.asarray(cls["ln1"]["bias"])
        sd[f"{p}.6.weight"] = lin_t(np.asarray(cls["out"]["kernel"]))
        sd[f"{p}.6.bias"] = np.asarray(cls["out"]["bias"])
    reg = hd["reg_branch"]
    for lvl in range(2):
        p = f"pts_bbox_head.reg_branches.{lvl}"
        sd[f"{p}.0.weight"] = lin_t(np.asarray(reg["fc0"]["kernel"]))
        sd[f"{p}.0.bias"] = np.asarray(reg["fc0"]["bias"])
        sd[f"{p}.2.weight"] = lin_t(np.asarray(reg["fc1"]["kernel"]))
        sd[f"{p}.2.bias"] = np.asarray(reg["fc1"]["bias"])
        sd[f"{p}.4.weight"] = lin_t(np.asarray(reg["out"]["kernel"]))
        sd[f"{p}.4.bias"] = np.asarray(reg["out"]["bias"])

    for tname, pat in (("adapt_pos3d", ("fc0", "fc1")), ("position_encoder", ("fc1", "fc2")),
                       ("query_embedding", ("fc0", "fc1"))):
        m = hd[tname]
        for ti, ours in zip((0, 2), pat):
            k = np.asarray(m[ours]["kernel"])
            if tname == "query_embedding":
                sd[f"pts_bbox_head.{tname}.{ti}.weight"] = lin_t(k)
            else:
                sd[f"pts_bbox_head.{tname}.{ti}.weight"] = dense_to_c1(k)
            sd[f"pts_bbox_head.{tname}.{ti}.bias"] = np.asarray(m[ours]["bias"])

    dec = hd["transformer"]["decoder"]
    sd["pts_bbox_head.transformer.decoder.post_norm.weight"] = np.asarray(dec["post_norm"]["scale"])
    sd["pts_bbox_head.transformer.decoder.post_norm.bias"] = np.asarray(dec["post_norm"]["bias"])
    for lvl in range(2):
        lay = dec[f"layer{lvl}"]
        for att_idx, att in (("0", "self_attn"), ("1", "cross_attn")):
            a = lay[att]
            base = f"pts_bbox_head.transformer.decoder.layers.{lvl}.attentions.{att_idx}.attn"
            inw = np.concatenate(
                [lin_t(np.asarray(a[p]["kernel"])) for p in ("q_proj", "k_proj", "v_proj")], 0
            )
            inb = np.concatenate([np.asarray(a[p]["bias"]) for p in ("q_proj", "k_proj", "v_proj")])
            sd[f"{base}.in_proj_weight"] = inw
            sd[f"{base}.in_proj_bias"] = inb
            sd[f"{base}.out_proj.weight"] = lin_t(np.asarray(a["out_proj"]["kernel"]))
            sd[f"{base}.out_proj.bias"] = np.asarray(a["out_proj"]["bias"])
        base = f"pts_bbox_head.transformer.decoder.layers.{lvl}"
        sd[f"{base}.ffns.0.layers.0.0.weight"] = lin_t(np.asarray(lay["ffn"]["fc1"]["kernel"]))
        sd[f"{base}.ffns.0.layers.0.0.bias"] = np.asarray(lay["ffn"]["fc1"]["bias"])
        sd[f"{base}.ffns.0.layers.1.weight"] = lin_t(np.asarray(lay["ffn"]["fc2"]["kernel"]))
        sd[f"{base}.ffns.0.layers.1.bias"] = np.asarray(lay["ffn"]["fc2"]["bias"])
        for ni in range(3):
            sd[f"{base}.norms.{ni}.weight"] = np.asarray(lay[f"norm{ni + 1}"]["scale"])
            sd[f"{base}.norms.{ni}.bias"] = np.asarray(lay[f"norm{ni + 1}"]["bias"])
    return sd


def test_full_roundtrip_coverage_and_equality():
    cfg, model, params, inputs = small_model()
    sd = synth_torch_sd(params)
    # randomize the torch side so equality is meaningful
    rng = np.random.RandomState(1)
    sd = {k: rng.randn(*v.shape).astype(np.float32) if v.ndim else v for k, v in sd.items()}
    # keep BN var positive
    for k in sd:
        if "running_var" in k:
            sd[k] = np.abs(sd[k]) + 0.5

    new_params, stats = convert_state_dict(sd, params, shared_branches=True)
    assert stats["skipped"] == 0, stats
    assert stats["unfilled"] == 0, stats

    # spot-check layout transposes
    np.testing.assert_allclose(
        np.asarray(new_params["backbone"]["stem1"]["conv"]["kernel"]),
        np.transpose(sd["img_backbone.stem.stem_1/conv.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_allclose(
        np.asarray(new_params["head"]["cls_branch"]["fc0"]["kernel"]),
        np.transpose(sd["pts_bbox_head.cls_branches.0.0.weight"], (1, 0)),
    )
    C = 32
    np.testing.assert_allclose(
        np.asarray(
            new_params["head"]["transformer"]["decoder"]["layer1"]["cross_attn"]["k_proj"]["kernel"]
        ),
        np.transpose(
            sd["pts_bbox_head.transformer.decoder.layers.1.attentions.1.attn.in_proj_weight"][C : 2 * C],
            (1, 0),
        ),
    )

    # converted params still run
    model_out = model.apply({"params": jax.tree.map(jnp.asarray, new_params)}, *inputs)
    assert np.isfinite(np.asarray(model_out["cls_logits"])).all()


def test_legacy_key_remap():
    cfg, model, params, _ = small_model()
    sd = synth_torch_sd(params)
    legacy = {}
    for k, v in sd.items():
        k = k.replace(".attentions.0.", ".self_attn.").replace(".attentions.1.", ".multihead_attn.")
        legacy[k] = v
    new_params, stats = convert_state_dict(legacy, params, shared_branches=True)
    assert stats["skipped"] == 0 and stats["unfilled"] == 0, stats


def test_convert_cli_roundtrip(tmp_path, monkeypatch, capsys):
    """cli.convert: torch .pth -> orbax params dir -> load_params."""
    import sys

    import torch

    import __graft_entry__ as ge
    from petr_tpu.cli import convert as convert_cli
    from petr_tpu.configs import get_config
    from petr_tpu.train import create_train_state
    from petr_tpu.train.checkpoint import load_params

    cfg = get_config("tiny_debug")
    N = cfg.data.num_views * cfg.data.num_frames
    H, W = cfg.data.image_size
    batch = ge._batch(1, N, H, W, cfg.data.max_gt)
    state = create_train_state(cfg, jax.random.PRNGKey(0), 1, batch)
    sd = synth_torch_sd(state.params)
    pth = tmp_path / "ref.pth"
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, pth)

    out = tmp_path / "imported"
    monkeypatch.setattr(
        sys, "argv",
        ["convert", "--config", "tiny_debug", "--torch-ckpt", str(pth),
         "--out", str(out)],
    )
    convert_cli.main()
    msg = capsys.readouterr().out
    assert "0 target leaves unfilled" in msg

    loaded = load_params(str(out), state.params)
    expected, stats = convert_state_dict(
        sd, state.params, shared_branches=cfg.model.head.shared_branches
    )
    assert stats["unfilled"] == 0
    for got, exp in zip(jax.tree.leaves(loaded), jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-6)


def test_resnet_dcn_key_map():
    """mmcv DCNv2 checkpoint keys (`conv2.weight` raw kernel +
    `conv2.conv_offset.*`) import into a DCN Bottleneck's param tree with full
    coverage and the right layout."""
    from petr_tpu.models.resnet import Bottleneck

    block = Bottleneck(mid=8, out=16, stride=1, use_dcn=True)
    x = jnp.zeros((1, 8, 8, 16))
    params = block.init(jax.random.PRNGKey(0), x)["params"]

    rng = np.random.RandomState(0)

    def t(*shape):  # torch OIHW conv weight
        return rng.randn(*shape).astype(np.float32)

    base = "img_backbone.layer3.0"
    sd = {
        f"{base}.conv1.weight": t(8, 16, 1, 1),
        f"{base}.conv2.weight": t(8, 8, 3, 3),
        f"{base}.conv2.conv_offset.weight": t(27, 8, 3, 3),
        f"{base}.conv2.conv_offset.bias": rng.randn(27).astype(np.float32),
        f"{base}.conv3.weight": t(16, 8, 1, 1),
    }
    for i, ch in (("1", 8), ("2", 8), ("3", 16)):
        sd[f"{base}.bn{i}.weight"] = rng.randn(ch).astype(np.float32)
        sd[f"{base}.bn{i}.bias"] = rng.randn(ch).astype(np.float32)
        sd[f"{base}.bn{i}.running_mean"] = rng.randn(ch).astype(np.float32)
        sd[f"{base}.bn{i}.running_var"] = np.abs(rng.randn(ch)).astype(np.float32) + 0.5

    new_params, stats = convert_state_dict(sd, {"backbone": {"layer3_block0": params}})
    assert stats["skipped"] == 0, stats
    assert stats["unfilled"] == 0, stats

    blk = new_params["backbone"]["layer3_block0"]
    np.testing.assert_allclose(
        np.asarray(blk["conv2_weight"]),
        np.transpose(sd[f"{base}.conv2.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_allclose(
        np.asarray(blk["conv2_offset"]["kernel"]),
        np.transpose(sd[f"{base}.conv2.conv_offset.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_allclose(
        np.asarray(blk["conv2_offset"]["bias"]), sd[f"{base}.conv2.conv_offset.bias"]
    )

    # imported block still runs
    out = block.apply({"params": jax.tree.map(jnp.asarray, blk)}, jnp.ones((1, 8, 8, 16)))
    assert np.isfinite(np.asarray(out)).all()


def test_publish_cli(tmp_path, monkeypatch, capsys):
    import sys

    import orbax.checkpoint as ocp

    from petr_tpu.cli import publish as publish_cli
    from petr_tpu.utils.publish import load_published

    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3)}
    ckpt = tmp_path / "step_00000001"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(str(ckpt), {"params": params, "step": np.int32(1)}, force=True)

    monkeypatch.setattr(
        sys, "argv",
        ["publish", "--ckpt", str(ckpt), "--out", str(tmp_path / "pub.pkl")],
    )
    publish_cli.main()
    msg = capsys.readouterr().out
    assert "published" in msg
    final = msg.split()[-1]
    got = load_published(final)
    np.testing.assert_array_equal(got["a"], params["a"])
