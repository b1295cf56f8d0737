"""Training CLI.

    python -m petr_tpu.cli.train --config petr_vov_p4_800x320 \
        --infos data/nuscenes_infos_train.pkl --data-root data/nuscenes \
        --work-dir work_dirs/petr_vov

Covers the reference `tools/train.py` capability: config selection, seeding,
epoch loop with the reference schedule, periodic JSON logging, checkpointing
with rotation, resume, and pretrained-backbone partial init. Multi-device:
shards the batch over the data axis of a (data, model) mesh.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--infos", required=True, help="train info .pkl")
    p.add_argument("--data-root", default="")
    p.add_argument("--work-dir", default="work_dirs/default")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None, help="global batch size")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--load-from", default=None, help="params-only checkpoint")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--max-steps", type=int, default=None, help="debug cap")
    p.add_argument(
        "--set", nargs="*", default=[], dest="overrides", metavar="KEY=VAL",
        help="dotted config overrides, e.g. model.remat=False train.optim.lr=1e-4",
    )
    p.add_argument(
        "--tensorboard", action="store_true",
        help="mirror scalar metrics to <work-dir>/tb (reference parity: the "
        "mmcv TensorboardLoggerHook, requirements.txt:10)",
    )
    # in-training evaluation (reference mmcv EvalHook: `evaluation =
    # dict(interval=N)`, petr_r50dcn_gridmask_p4.py:262)
    p.add_argument("--eval-infos", default=None, help="val info .pkl; evaluates "
                   "mAP/NDS every --eval-interval epochs")
    p.add_argument("--eval-interval", type=int, default=1, help="epochs between evals")
    # multi-host SPMD (replaces the reference's torch.distributed/SLURM
    # launchers): every host runs the same command; env fallbacks
    # COORDINATOR_ADDRESS / NUM_PROCESSES|WORLD_SIZE / PROCESS_ID|RANK
    p.add_argument("--coordinator", default=None, help="host:port of process 0")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args()


def ckpt_meta(cfg):
    import dataclasses

    import petr_tpu
    from petr_tpu.configs.config import NUSCENES_CLASSES

    return {
        "petr_tpu_version": petr_tpu.__version__,
        "classes": list(NUSCENES_CLASSES),
        "config": dataclasses.asdict(cfg),
    }


def main():
    args = parse_args()
    from petr_tpu.configs import get_config
    from petr_tpu.data import Loader, NuScenesDataset
    from petr_tpu.parallel.distributed import (
        host_local_batch_to_global,
        init_distributed,
        make_pod_mesh,
    )
    from petr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from petr_tpu.train import create_train_state, make_train_step
    from petr_tpu.train.checkpoint import (
        latest_checkpoint,
        load_params,
        restore_checkpoint,
        save_checkpoint,
    )

    # must run before any backend use; no-op single-process
    init_distributed(args.coordinator, args.num_processes, args.process_id)
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0

    cfg = get_config(args.config, args.overrides)
    epochs = args.epochs or cfg.train.optim.epochs

    ds = NuScenesDataset.from_pkl(
        args.infos, cfg.data, training=True, data_root=args.data_root
    )
    n_dev = jax.device_count()
    batch_size = args.batch_size or cfg.train.optim.batch_size_per_device * n_dev
    if batch_size % n_proc:
        raise SystemExit(f"global batch {batch_size} not divisible by {n_proc} processes")
    local_bs = batch_size // n_proc
    loader = Loader(
        ds, local_bs, seed=args.seed,
        process_shard=(jax.process_index(), n_proc) if n_proc > 1 else None,
    )
    steps_per_epoch = len(loader)
    if steps_per_epoch == 0:
        raise SystemExit(
            f"global batch size {batch_size} exceeds dataset size {len(ds)} "
            f"(pass --batch-size <= {len(ds)})"
        )
    total_steps = steps_per_epoch * epochs

    if n_proc > 1:
        mesh = make_pod_mesh()
    else:
        # data ways must divide the batch; leftover devices go to the
        # decoder token axis (make_mesh default is pure DP = data=n)
        import math as _math

        mesh = make_mesh(data=_math.gcd(batch_size, n_dev))
    sample = next(iter(loader.epoch(0)))
    sample = {k: jnp.asarray(v) for k, v in sample.items() if k != "tokens"}
    state = create_train_state(cfg, jax.random.PRNGKey(args.seed), total_steps, sample)

    if args.load_from:
        state = state.replace(params=load_params(args.load_from, state.params))
    ckpt_base = os.path.join(args.work_dir, "ckpts")
    if args.resume:
        latest = latest_checkpoint(ckpt_base)
        if latest:
            state = restore_checkpoint(latest, state)
            print(f"resumed from {latest} at step {int(state.step)}")

    # env + resolved-config dump at startup (reference tools/train.py:190-202)
    if is_main:
        import dataclasses

        import petr_tpu

        env = {
            "petr_tpu": petr_tpu.__version__,
            "jax": jax.__version__,
            "backend": jax.default_backend(),
            "devices": n_dev,
            "processes": n_proc,
            "global_batch": batch_size,
            "steps_per_epoch": steps_per_epoch,
        }
        print(json.dumps({"env": env}))
        print(json.dumps({"config": dataclasses.asdict(cfg)}, default=str))

    os.makedirs(args.work_dir, exist_ok=True)
    logf = open(os.path.join(args.work_dir, "train_log.jsonl"), "a") if is_main else None
    tb_writer = None
    if args.tensorboard and is_main:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb_writer = SummaryWriter(os.path.join(args.work_dir, "tb"))
        except ImportError:
            print("tensorboard unavailable; scalar logging stays JSON-only")

    train_step = make_train_step(cfg)
    rng = jax.random.PRNGKey(args.seed + 1)

    # Preemption-safe shutdown: TPU-pod maintenance/preemption delivers
    # SIGTERM. Finish the in-flight step, checkpoint, and exit 0 so the
    # scheduler restarts with --resume. (Second signal falls through to the
    # default handler so a stuck save can still be interrupted.)
    preempted = []

    def _on_signal(signum, frame):
        preempted.append(signum)
        signal.signal(signum, signal.SIG_DFL)
        print(f"signal {signum} received; checkpointing at step boundary")

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    with jax.set_mesh(mesh):
        state = replicate(state, mesh)
        step_fn = jax.jit(train_step, donate_argnums=(0,))

        start_epoch = int(state.step) // max(steps_per_epoch, 1)
        t_last = time.time()
        for epoch in range(start_epoch, epochs):
            for batch in loader.epoch(epoch):
                batch.pop("tokens", None)
                if n_proc > 1:
                    batch = host_local_batch_to_global(
                        {k: np.asarray(v) for k, v in batch.items()}, mesh
                    )
                else:
                    batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
                state, metrics = step_fn(state, batch, rng)
                step = int(state.step)
                if step % args.log_every == 0 and is_main:
                    metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    dt = time.time() - t_last
                    t_last = time.time()
                    rec = {
                        "epoch": epoch,
                        "step": step,
                        "time_per_iter": dt / max(args.log_every, 1),
                        **metrics,
                    }
                    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v for k, v in rec.items()}))
                    logf.write(json.dumps(rec) + "\n")
                    logf.flush()
                    if tb_writer is not None:
                        for k, v in rec.items():
                            if k != "step" and isinstance(v, (int, float)):
                                tb_writer.add_scalar(k, v, global_step=step)
                if preempted or (args.max_steps and step >= args.max_steps):
                    # all processes save (orbax coordinates; primary writes)
                    save_checkpoint(ckpt_base, step, jax.device_get(state),
                                    cfg.train.max_keep_ckpts, meta=ckpt_meta(cfg))
                    if preempted and is_main:
                        print(f"checkpoint saved at step {step}; exiting on "
                              f"signal {preempted[0]} (resume with --resume)")
                    return
            save_checkpoint(ckpt_base, int(state.step), jax.device_get(state),
                            cfg.train.max_keep_ckpts, meta=ckpt_meta(cfg))
            if is_main:
                print(f"epoch {epoch} done; checkpoint saved")
            if args.eval_infos and (epoch + 1) % max(args.eval_interval, 1) == 0:
                # mmcv EvalHook-under-DDP capability: ALL processes enter
                # (the gather inside is a collective); each decodes its
                # stride of the val split, everyone gets full metrics,
                # only the main process logs.
                from petr_tpu.train.evaluate import evaluate_model_multiprocess

                val_ds = NuScenesDataset.from_pkl(
                    args.eval_infos, cfg.data, training=False,
                    data_root=args.data_root,
                )
                results = {f"val/{k}": float(v) for k, v in
                           evaluate_model_multiprocess(cfg, state.params, val_ds).items()}
                if is_main:
                    rec = {"epoch": epoch, "step": int(state.step), **results}
                    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                                      for k, v in rec.items()}))
                    if logf is not None:
                        logf.write(json.dumps(rec) + "\n")
                        logf.flush()
                    if tb_writer is not None:
                        for k, v in results.items():
                            tb_writer.add_scalar(k, v, global_step=int(state.step))


if __name__ == "__main__":
    main()
