"""Velocity diagnostic on a trained checkpoint: TP-matched predicted-vs-GT
velocity statistics vs the predict-zero baseline (the v=0-collapse
discriminator; stats definition in petr_tpu/train/diagnostics.py).

    python tools/diag_vel.py --config synth_small_v2 \
        --infos /tmp/petr_synth_v2/synth_infos_val.pkl \
        --ckpt /root/work/synthv2_ckpt            # dir -> latest step

Round-4 provenance: this diagnostic (then in /root/work) established that
the 8k-step temporal run's mAVE 1.504 was the degenerate v=0 solution
(pred std 0.01 m/s vs GT 1.5) and not a decode bug — the discrimination
that made round 5's velocity recipe a targeted fix.
"""

import argparse
import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="synth_small_v2")
    p.add_argument("--infos", required=True)
    p.add_argument("--ckpt", required=True,
                   help="checkpoint step dir, or a dir of them (latest wins)")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--image-hw", type=int, nargs=2, default=(128, 320))
    p.add_argument("--score-thr", type=float, default=0.15)
    p.add_argument("--set", nargs="*", default=[], dest="overrides")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from petr_tpu.configs import get_config
    from petr_tpu.data import Loader, NuScenesDataset
    from petr_tpu.train import create_train_state
    from petr_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint
    from petr_tpu.train.diagnostics import make_velocity_probe

    H, W = args.image_hw
    cfg = get_config(args.config, args.overrides)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, image_size=(H, W), final_dim=(H, W), resize_lim=(1.0, 1.0),
        bot_pct_lim=(0.0, 0.0), max_gt=32))
    ds = NuScenesDataset.from_pkl(args.infos, cfg.data, training=False,
                                  src_hw=(H, W))
    loader = Loader(ds, args.batch_size, shuffle=False, drop_last=False)
    b0 = next(iter(loader.epoch(0)))
    b0.pop("tokens")
    jb = {k: jnp.asarray(v) for k, v in b0.items()}
    state = create_train_state(cfg, jax.random.PRNGKey(0), 1, jb)
    ck = latest_checkpoint(args.ckpt) or args.ckpt
    state = restore_checkpoint(ck, state)
    print(f"ckpt: {ck}", flush=True)

    probe = make_velocity_probe(cfg, ds, batch_size=args.batch_size,
                                score_thr=args.score_thr)
    print(json.dumps({k: round(v, 4) for k, v in probe(state.params).items()}))


if __name__ == "__main__":
    main()
