"""Synthetic-scene overfit harness: end-to-end training-loop validation.

Trains the detector on ONE fixed synthetic batch (planted GT boxes, random
images) and checks that (a) the total loss decreases by a large factor and
(b) NMS-free decoding recovers every planted box center. This exercises the
full loop — device-side Hungarian matching, focal/L1 losses, AdamW +
warmup/cosine schedule, bf16/fp32 islands, decode — the way the reference's
golden-metric regression (`tools/dist_test.sh <cfg> <ckpt> --eval bbox`)
would, but without the nuScenes dataset.

    python tools/overfit_demo.py [--config tiny_debug] [--steps 300]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="tiny_debug")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--num-gt", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--tol-center", type=float, default=2.0, help="meters")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from petr_tpu.configs import get_config
    from petr_tpu.train.train_step import create_train_state, make_eval_step, make_train_step

    cfg = get_config(args.config)
    # overfit-friendly schedule: constant-ish lr, short warmup, no grid-mask
    ocfg = dataclasses.replace(
        cfg.train.optim, lr=args.lr, warmup_iters=10, min_lr_ratio=1.0, epochs=1,
        backbone_lr_mult=1.0,
    )
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, use_grid_mask=False),
        train=dataclasses.replace(cfg.train, optim=ocfg),
    )

    B, (H, W), G = 1, cfg.data.image_size, args.num_gt
    N = cfg.data.num_views * cfg.data.num_frames
    batch = ge._batch(B, N, H, W, G, with_ts=cfg.data.num_frames > 1, seed=3)
    if cfg.data.num_frames > 1:
        # realistic lidar-relative timestamps: current 6 at 0, prev 6 at +0.5
        import jax.numpy as _jnp

        ts = np.zeros((B, N), np.float32)
        ts[:, cfg.data.num_views:] = 0.5
        batch["timestamp"] = _jnp.asarray(ts)

    state = create_train_state(cfg, jax.random.PRNGKey(0), args.steps, batch)
    train_step = jax.jit(make_train_step(cfg))
    eval_step = jax.jit(make_eval_step(cfg))

    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    first = None
    for i in range(args.steps):
        state, metrics = train_step(state, batch, rng)
        if i % 50 == 0 or i == args.steps - 1:
            loss = float(metrics["loss"])
            if first is None:
                first = loss
            print(f"step {i:4d}  loss {loss:.4f}", flush=True)
    last = float(metrics["loss"])
    print(f"trained {args.steps} steps in {time.time() - t0:.1f}s; "
          f"loss {first:.3f} -> {last:.3f}")

    det = jax.device_get(eval_step(state.params, batch))
    boxes = det["boxes"][0]
    scores = det["scores"][0]
    order = np.argsort(-scores)
    topk = boxes[order[: 3 * G]]
    gt = np.asarray(batch["gt_boxes"][0])
    dists = np.linalg.norm(topk[None, :, :2] - gt[:, None, :2], axis=-1).min(axis=1)
    print("per-GT nearest-detection center error (m):",
          np.array2string(dists, precision=2))

    ok_loss = last < first * 0.25
    ok_boxes = (dists < args.tol_center).all()
    print(f"loss reduced 4x: {ok_loss}; all {G} GT centers recovered "
          f"(<{args.tol_center} m): {ok_boxes}")
    if not (ok_loss and ok_boxes):
        sys.exit(1)
    print("OVERFIT DEMO OK")


if __name__ == "__main__":
    main()
