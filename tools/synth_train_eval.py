"""Multi-scene synthetic end-to-end training validation.

Generates a procedural multi-scene dataset (petr_tpu/data/synthetic.py:
distinct scenes, 3 color-coded classes, moving objects), trains a config
on the TRAIN scenes through the real loader/train-step stack, and scores
HELD-OUT scenes with the devkit-exact evaluator — the in-container proxy
for the reference's golden-metric protocol
(`tools/dist_test.sh <cfg> <ckpt> --eval bbox` against nuScenes val).
Generalization (not memorization) is what's measured: val scenes are never
seen in training.

    python tools/synth_train_eval.py   # defaults: synth_small preset,
    #   80 scenes (8 held out), 12k steps, floor 0.15
    # (measured runs + shorter recipes: README "Measured performance")

Prints one JSON line {train_loss_first, train_loss_last, val/mAP, val/NDS,
...} and exits nonzero if held-out mAP (over the 3 present classes) is
below --floor.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="synth_small")
    p.add_argument("--steps", type=int, default=12000)
    p.add_argument("--scenes", type=int, default=80)
    p.add_argument("--val-scenes", type=int, default=2)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--objects", type=int, default=6)
    p.add_argument("--image-hw", type=int, nargs=2, default=(128, 320))
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--min-lr-ratio", type=float, default=0.2,
                   help="cosine-schedule floor as a fraction of --lr (the "
                   "velocity recipe keeps this high: round 4's mAVE failure "
                   "traced to LR decaying below what cross-frame "
                   "correspondence needs to escape the v=0 local optimum)")
    p.add_argument("--floor", type=float, default=0.15, help="min held-out mAP")
    p.add_argument("--mave-ceiling", type=float, default=None,
                   help="max held-out mAVE (temporal validation: the v2 run "
                   "must BEAT the single-frame floor on motion-only data, "
                   "README synthetic table)")
    p.add_argument("--out-dir", default="/tmp/petr_synth")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=0,
                   help="evaluate held-out every N steps (progress diagnostic)")
    p.add_argument("--eval-train", action="store_true",
                   help="also score the TRAIN scenes (memorization diagnostic)")
    p.add_argument("--no-aug", action="store_true",
                   help="disable flip/BEV aug (diagnostic)")
    p.add_argument("--no-velocity-hue", action="store_true",
                   help="render WITHOUT the velocity hue cue: inter-frame "
                   "motion becomes the only velocity signal (temporal-"
                   "pathway discrimination; see data/synthetic.py)")
    p.add_argument("--probe-velocity", action="store_true",
                   help="print TP-matched velocity stats (pred std, corr, "
                   "error vs the predict-zero baseline) at every eval "
                   "boundary — the v=0-collapse discriminator "
                   "(petr_tpu/train/diagnostics.py)")
    p.add_argument("--bn-warmup", type=int, default=0, metavar="N",
                   help="estimate BN running stats from N forward passes "
                   "before training (precise-BN; reproduces the pretrained-"
                   "stats regime the reference recipes train in — enables "
                   "bf16 from-scratch under frozen BN; "
                   "petr_tpu/train/bn_warmup.py)")
    p.add_argument("--bn-refresh", action="store_true",
                   help="re-estimate BN stats (--bn-warmup batches) at every "
                   "eval boundary so the frozen stats track the drifting "
                   "weights")
    p.add_argument("--save-ckpt", default=None, metavar="DIR",
                   help="save final params as an orbax checkpoint under DIR "
                   "(for cli.test --streaming on the learned weights)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint under --save-ckpt "
                   "(full state: params + opt_state + step), so an OOM-killed "
                   "run continues instead of restarting")
    p.add_argument("--set", nargs="*", default=[], dest="overrides",
                   metavar="KEY=VAL", help="dotted config overrides")
    args = p.parse_args()

    import jax
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from petr_tpu.configs import get_config
    from petr_tpu.data import Loader, NuScenesDataset
    from petr_tpu.data.synthetic import SYNTH_CLASSES, generate_synthetic_scenes
    from petr_tpu.train import create_train_state, make_train_step
    from petr_tpu.train.evaluate import evaluate_model

    H, W = args.image_hw
    t0 = time.time()
    splits = generate_synthetic_scenes(
        args.out_dir, n_scenes=args.scenes, frames_per_scene=args.frames,
        image_hw=(H, W), n_objects=args.objects, seed=args.seed,
        val_scenes=args.val_scenes, velocity_hue=not args.no_velocity_hue,
    )
    print(f"generated {len(splits['train'])} train / {len(splits['val'])} val "
          f"frames in {time.time() - t0:.1f}s", flush=True)

    cfg = get_config(args.config, args.overrides)
    dcfg = dataclasses.replace(
        cfg.data, image_size=(H, W), final_dim=(H, W), resize_lim=(1.0, 1.0),
        bot_pct_lim=(0.0, 0.0), max_gt=32,
        **(dict(rand_flip=False, bev_rot_range=(0.0, 0.0),
                bev_scale_range=(1.0, 1.0)) if args.no_aug else {}),
    )
    ocfg = dataclasses.replace(
        cfg.train.optim, lr=args.lr, warmup_iters=50,
        min_lr_ratio=args.min_lr_ratio, backbone_lr_mult=1.0,
    )
    cfg = dataclasses.replace(
        cfg, data=dcfg, train=dataclasses.replace(cfg.train, optim=ocfg),
    )

    train_ds = NuScenesDataset(splits["train"], cfg.data, training=True, src_hw=(H, W))
    val_ds = NuScenesDataset(splits["val"], cfg.data, training=False, src_hw=(H, W))
    loader = Loader(train_ds, args.batch_size, seed=args.seed)

    import jax.numpy as jnp

    batch0 = next(iter(loader.epoch(0)))
    batch0.pop("tokens")
    jb = {k: jnp.asarray(v) for k, v in batch0.items()}
    state = create_train_state(cfg, jax.random.PRNGKey(args.seed), args.steps, jb)
    step_fn = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    rng = jax.random.PRNGKey(args.seed + 1)

    def loader_batches(n):
        """First n train batches as device-ready dicts (for BN estimation)."""
        out = []
        for batch in loader.epoch(0):
            batch.pop("tokens")
            out.append({k: jnp.asarray(v) for k, v in batch.items()})
            if len(out) >= n:
                break
        return out

    vel_probe = None
    if args.probe_velocity:
        from petr_tpu.train.diagnostics import make_velocity_probe

        vel_probe = make_velocity_probe(cfg, val_ds, batch_size=args.batch_size)

    first = last = None
    step = 0
    if args.resume and args.save_ckpt:
        from petr_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint

        ck = latest_checkpoint(args.save_ckpt)
        if ck is not None:
            state = restore_checkpoint(ck, state)
            step = int(state.step)
            print(f"resumed from {ck} at step {step}", flush=True)
    if args.bn_warmup and step == 0:
        # fresh start only: a resumed run's stats are in the checkpoint
        from petr_tpu.train.bn_warmup import estimate_bn_stats

        t1 = time.time()
        state = state.replace(params=estimate_bn_stats(
            cfg, state.params, loader_batches(args.bn_warmup)))
        print(f"bn-warmup: estimated BN stats from {args.bn_warmup} "
              f"batches in {time.time() - t1:.1f}s", flush=True)
    skips = 0
    skips_dev = jnp.zeros((), jnp.int32)
    snap = None  # (step, host TrainState copy) from the last healthy boundary
    t0 = time.time()
    while step < args.steps:
        epoch = step // max(len(loader), 1)
        for batch in loader.epoch(epoch):
            batch.pop("tokens")
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, jb, rng)
            step += 1
            # lazy device-side accumulation — a host read here would sync
            # every step (28 ms RTT on the relay)
            skips_dev = skips_dev + metrics.get("skipped", 0)
            if step % 100 == 0 or step == 1:
                skips = int(skips_dev)
                last = float(metrics["loss"])
                if first is None:
                    first = last
                gn = float(metrics.get("grad_norm", float("nan")))
                nf = int(metrics.get("grad_nonfinite", 0))
                print(f"step {step:5d}  loss {last:.4f}  gnorm {gn:9.2f}  "
                      f"({step / max(time.time() - t0, 1e-9):.2f} it/s)"
                      + (f"  NONFINITE->SKIPPED (total {skips})" if nf else ""),
                      flush=True)
                # nonfinite steps are now SKIPPED (mmcv fp16-hook parity), so
                # a spike is survivable; abort only when params are already
                # dead (loss==0 forever — losses are nan_to_num'd) or the
                # run is skipping so often it cannot be learning
                if not (last > 0.0) or skips > 20 + step // 10:
                    print(f"ABORT: training diverged at step {step} "
                          f"(loss={last}, nonfinite_grads={nf}, skips={skips})",
                          flush=True)
                    if snap is not None:
                        from petr_tpu.train.forensics import save_snapshot

                        path = save_snapshot(
                            f"{args.out_dir}/forensics", snap[1], snap[0], cfg,
                            loader_args=dict(batch_size=args.batch_size,
                                             seed=args.seed, steps=args.steps),
                        )
                        print(f"forensics: last healthy state (step {snap[0]}) "
                              f"-> {path}; replay with tools/nan_replay.py",
                              flush=True)
                    sys.exit(2)
                # healthy boundary: snapshot AFTER the check (host copy; the
                # donated device buffers can't be held across steps)
                snap = (step, jax.device_get(state))
            if step % 100 == 0:
                # the remote-relay client's host-side buffers grow with
                # enqueued batch bytes (a 12-view batch-4 run was OOM-killed
                # at ~150 GB enqueued, round 3); collect aggressively
                import gc

                gc.collect()
            if args.eval_every and step % args.eval_every == 0 and step < args.steps:
                r = evaluate_model(cfg, state.params, val_ds,
                                   batch_size=args.batch_size, classes=SYNTH_CLASSES)
                print(json.dumps({"step": step, "val/mAP": round(r["mAP"], 4),
                                  "val/NDS": round(r["NDS"], 4),
                                  "val/mAVE": round(r.get("mAVE", float("nan")), 4),
                                  "val/mATE": round(r["mATE"], 4)}), flush=True)
                if vel_probe is not None:
                    print(json.dumps({"step": step, **{
                        f"vel/{k}": round(v, 4)
                        for k, v in vel_probe(state.params).items()}}), flush=True)
                if args.bn_refresh and args.bn_warmup:
                    from petr_tpu.train.bn_warmup import estimate_bn_stats

                    state = state.replace(params=estimate_bn_stats(
                        cfg, state.params, loader_batches(args.bn_warmup)))
                    print(f"bn-refresh: re-estimated BN stats at step {step}",
                          flush=True)
                if args.save_ckpt:
                    # periodic save so an OOM-killed run keeps its progress
                    from petr_tpu.train.checkpoint import save_checkpoint

                    save_checkpoint(args.save_ckpt, step, state,
                                    meta={"config": args.config})
                    print(f"checkpointed at step {step}", flush=True)
            if step >= args.steps:
                break
    last = float(metrics["loss"])

    results = evaluate_model(cfg, state.params, val_ds,
                             batch_size=args.batch_size, classes=SYNTH_CLASSES)
    if args.eval_train:
        train_eval_ds = NuScenesDataset(splits["train"], cfg.data,
                                        training=False, src_hw=(H, W))
        tr = evaluate_model(cfg, state.params, train_eval_ds,
                            batch_size=args.batch_size, classes=SYNTH_CLASSES)
        print(json.dumps({f"train/{k}": round(float(v), 4)
                          for k, v in sorted(tr.items())}), flush=True)
    if args.save_ckpt:
        from petr_tpu.train.checkpoint import save_checkpoint

        path = save_checkpoint(args.save_ckpt, int(state.step), state,
                               meta={"config": args.config})
        print(f"saved checkpoint: {path}", flush=True)

    rec = {"steps": args.steps, "train_loss_first": round(first, 3),
           "train_loss_last": round(last, 3),
           "wall_s": round(time.time() - t0, 1),
           **{f"val/{k}": round(float(v), 4) for k, v in sorted(results.items())}}
    print(json.dumps(rec), flush=True)
    if results["mAP"] < args.floor:
        print(f"FAIL: held-out mAP {results['mAP']:.3f} < floor {args.floor}")
        sys.exit(1)
    if args.mave_ceiling is not None and results["mAVE"] >= args.mave_ceiling:
        print(f"FAIL: held-out mAVE {results['mAVE']:.3f} >= ceiling "
              f"{args.mave_ceiling}")
        sys.exit(1)
    print(f"SYNTH TRAIN/EVAL OK: held-out mAP {results['mAP']:.3f} "
          f">= {args.floor}"
          + (f", mAVE {results['mAVE']:.3f} < {args.mave_ceiling}"
             if args.mave_ceiling is not None else ""))


if __name__ == "__main__":
    main()
