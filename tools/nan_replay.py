"""Replay a divergence from a forensics snapshot and name the culprit.

    python tools/nan_replay.py --snapshot /tmp/.../forensics/healthy_step_*.pkl \
        --out-dir /tmp/petr_synth_nohue_v2 [--max-steps 300]

Restores the last-healthy (params, opt_state, step) saved by the training
driver, rebuilds the deterministic loader position, and re-runs steps one
at a time watching ``grad_nonfinite``. At the first bad step it reports:
per-subtree gradient nonfinite counts, whether the FORWARD of that batch is
already nonfinite (capture_intermediates module map), and saves the batch
+ rng to <snapshot_dir>/bad_step.pkl for targeted dissection
(tools/flash_kernel_dissect.py consumes it).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--snapshot", required=True)
    p.add_argument("--out-dir", required=True,
                   help="the diverged run's --out-dir (dataset pkl lives there)")
    p.add_argument("--max-steps", type=int, default=300)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from petr_tpu.data import Loader, NuScenesDataset
    from petr_tpu.train import create_train_state, make_train_step
    from petr_tpu.train.forensics import (
        first_nonfinite_intermediates,
        load_snapshot,
        nonfinite_by_subtree,
    )
    from petr_tpu.train.train_step import make_grad_fn

    snap = load_snapshot(args.snapshot)
    cfg, step0 = snap["cfg"], snap["step"]
    la = snap["loader_args"]
    bs, seed = la["batch_size"], la["seed"]
    H, W = cfg.data.image_size

    ds = NuScenesDataset.from_pkl(
        os.path.join(args.out_dir, "synth_infos_train.pkl"), cfg.data,
        training=True, src_hw=(H, W),
    )
    loader = Loader(ds, bs, seed=seed)

    batch0 = next(iter(loader.epoch(0)))
    batch0.pop("tokens")
    jb0 = {k: jnp.asarray(v) for k, v in batch0.items()}
    state = create_train_state(cfg, jax.random.PRNGKey(seed), la.get("steps", 1000), jb0)
    state = state.replace(
        params=jax.tree.map(jnp.asarray, snap["params"]),
        opt_state=jax.tree.map(jnp.asarray, snap["opt_state"]),
        step=jnp.asarray(step0, jnp.int32),
    )
    step_fn = jax.jit(make_train_step(cfg))  # NO donation: we rewind one step
    rng = jax.random.PRNGKey(seed + 1)

    n_per_epoch = len(loader)
    step = step0
    print(f"replaying from healthy step {step0} "
          f"(epoch {step0 // n_per_epoch}, offset {step0 % n_per_epoch})", flush=True)

    def batches():
        e = step0 // n_per_epoch
        skip = step0 % n_per_epoch
        while True:
            for i, b in enumerate(loader.epoch(e)):
                if e == step0 // n_per_epoch and i < skip:
                    continue
                b.pop("tokens")
                yield {k: jnp.asarray(v) for k, v in b.items()}
            e += 1
            skip = -1

    for jb in batches():
        new_state, metrics = step_fn(state, jb, rng)
        nf = int(metrics["grad_nonfinite"])
        step += 1
        if nf:
            print(f"FIRST BAD STEP: {step} (grad_nonfinite={nf}, "
                  f"loss={float(metrics['loss'])})", flush=True)
            step_rng = jax.random.fold_in(jax.random.fold_in(rng, state.step), 0)
            # 1. per-subtree gradient damage
            gfn = make_grad_fn(cfg)
            total, losses, grads, _ = gfn(state.params, jb, step_rng)
            print("loss at bad step (recomputed):", float(total), flush=True)
            print("nonfinite grads by subtree:",
                  nonfinite_by_subtree(jax.device_get(grads)), flush=True)
            print("loss components:",
                  {k: float(v) for k, v in jax.device_get(losses).items()}, flush=True)
            # 2. forward dissection (training mode: dropout/grid-mask active)
            from petr_tpu.models import PETRDetector

            model = PETRDetector(cfg.model, deterministic=False)
            gm_rng, drop_rng = jax.random.split(step_rng)
            extra = {}
            if cfg.model.head.kind == "depthr":
                extra = dict(gt_boxes=jb["gt_boxes"], gt_valid=jb["gt_valid"],
                             lidar2img=jb["lidar2img"])
            _, bad = first_nonfinite_intermediates(
                model, {"params": state.params}, jb["images"], jb["img2lidar"],
                jb["img_hw"], timestamp=jb.get("timestamp"),
                grid_mask_rng=gm_rng, rngs={"dropout": drop_rng}, **extra,
            )
            if bad:
                print("nonfinite FORWARD activations (module, n, size):", flush=True)
                for path, n, size in bad[:40]:
                    print(f"  {path}: {n}/{size}", flush=True)
            else:
                print("forward is finite -> NaN born in the BACKWARD pass", flush=True)
            # 3. save the evidence
            out = os.path.join(os.path.dirname(args.snapshot), "bad_step.pkl")
            with open(out, "wb") as f:
                pickle.dump({"batch": jax.device_get(jb), "step": int(state.step),
                             "params": jax.device_get(state.params)}, f)
            print(f"saved bad batch + pre-step params -> {out}", flush=True)
            return
        state = new_state
        if step % 20 == 0:
            print(f"  step {step}: loss {float(metrics['loss']):.4f} "
                  f"gnorm {float(metrics['grad_norm']):.2f}", flush=True)
        if step - step0 >= args.max_steps:
            print(f"no divergence within {args.max_steps} replay steps "
                  "(nondeterministic trigger?); rerun with more", flush=True)
            return


if __name__ == "__main__":
    main()
