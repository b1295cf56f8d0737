"""Inspect a learned PETRv2 checkpoint's internals: FPE gate statistics,
per-query decoder feature spread, cls-logit spread — the "is the temporal
head degenerate?" companion to tools/diag_vel.py (round-4 provenance: ruled
out a saturated FPE gate as the cause of the v=0 velocity collapse).

    python tools/diag_v2_fpe.py --infos /tmp/petr_synth_v2/synth_infos_train.pkl \
        --ckpt /root/work/synthv2_ckpt
"""

import argparse
import dataclasses
import sys

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="synth_small_v2")
    p.add_argument("--infos", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--image-hw", type=int, nargs=2, default=(128, 320))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from petr_tpu.configs import get_config
    from petr_tpu.data import Loader, NuScenesDataset
    from petr_tpu.models import PETRDetector
    from petr_tpu.train import create_train_state
    from petr_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint

    H, W = args.image_hw
    cfg = get_config(args.config)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, image_size=(H, W), final_dim=(H, W), resize_lim=(1.0, 1.0),
        bot_pct_lim=(0.0, 0.0), max_gt=32))

    ds = NuScenesDataset.from_pkl(args.infos, cfg.data, training=False,
                                  src_hw=(H, W))
    ds.infos = ds.infos[:4]
    loader = Loader(ds, 4, shuffle=False, drop_last=False)
    b0 = next(iter(loader.epoch(0)))
    b0.pop("tokens")
    jb = {k: jnp.asarray(v) for k, v in b0.items()}
    state = create_train_state(cfg, jax.random.PRNGKey(0), 1, jb)
    ck = latest_checkpoint(args.ckpt) or args.ckpt
    print("ckpt:", ck)
    state = restore_checkpoint(ck, state)

    model = PETRDetector(cfg.model, deterministic=True)
    outs, mut = jax.jit(lambda p, b: model.apply(
        {"params": p}, b["images"], b["img2lidar"], b["img_hw"],
        timestamp=b.get("timestamp"), capture_intermediates=True,
        mutable=["intermediates"]))(state.params, jb)
    inter = jax.device_get(mut["intermediates"])

    flat = {jax.tree_util.keystr(pth): np.asarray(l, np.float32)
            for pth, l in jax.tree_util.tree_leaves_with_path(inter)}
    for key, a in flat.items():
        if any(s in key for s in (
                "fpe']['conv_expand", "input_proj'][",
                "position_encoder']['__call__", "transformer']['__call__",
                "post_norm")):
            print(f"{key}: {a.shape} max {np.abs(a).max():.3e} "
                  f"mean {np.abs(a).mean():.3e}")

    gate_key = "['head']['fpe']['conv_expand']['__call__'][0]"
    if gate_key in flat:
        g = 1.0 / (1.0 + np.exp(-flat[gate_key]))
        print(f"FPE gate: mean {g.mean():.4f} min {g.min():.4f} "
              f"max {g.max():.4f} frac<0.01 {(g < 0.01).mean():.3f}")

    dec = flat["['head']['transformer']['__call__'][0]"]  # (L, B, Q, C)
    last = dec[-1]
    print(f"decoder final layer: std across queries {last.std(axis=1).mean():.4e} "
          f"(feature scale {np.abs(last).mean():.4f})")
    cls = np.asarray(outs["cls_logits"], np.float32)[-1]
    print(f"cls logits: std across queries {cls.std(axis=1).mean():.4e} "
          f"max {cls.max():.3f}")


if __name__ == "__main__":
    main()
