"""Inference FPS benchmark CLI (reference `tools/analysis_tools/benchmark.py`).

    python -m petr_tpu.cli.benchmark --config petr_vov_p4_800x320 [--train]

Warmup 5 iterations, synchronized timing, reports samples/s (one sample =
num_views images). --train times the full training step instead.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="petr_vov_p4_800x320")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--train", action="store_true")
    p.add_argument(
        "--set", nargs="*", default=[], dest="overrides", metavar="KEY=VAL",
        help="dotted config overrides, e.g. model.remat=False",
    )
    p.add_argument(
        "--quant-scales", default=None, metavar="NPZ",
        help="int8 PTQ: activation-scale .npz from petr_tpu.cli.quantize "
        "(forces model.backbone.quant=int8; inference mode only)",
    )
    args = p.parse_args()

    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from petr_tpu.configs import get_config
    from petr_tpu.models import PETRDetector
    from petr_tpu.train import create_train_state, make_train_step

    cfg = get_config(args.config, args.overrides)
    B = args.batch_size
    N = cfg.data.num_views * cfg.data.num_frames
    H, W = cfg.data.image_size
    # distinct batches: identical async dispatches can be coalesced by the
    # runtime and undercount wall time
    batches = [
        ge._batch(B, N, H, W, cfg.data.max_gt, with_ts=cfg.data.num_frames > 1, seed=s)
        for s in range(4)
    ]
    batch = batches[0]

    if args.train:
        state = create_train_state(cfg, jax.random.PRNGKey(0), 1000, batch)
        rng = jax.random.PRNGKey(1)
        compiled = jax.jit(make_train_step(cfg), donate_argnums=(0,)).lower(
            state, batch, rng
        ).compile()

        def run(i=0):
            nonlocal state
            state, m = compiled(state, batches[i % len(batches)], rng)
            # host value read: the remote-execution relay completes lazily —
            # block_until_ready alone under-counts wall time
            return float(m["loss"])

    else:
        import dataclasses

        quant_scales = None
        from petr_tpu.configs.config import eval_model_config

        model_cfg = eval_model_config(cfg.model)
        if args.quant_scales:
            from petr_tpu.quant import load_scales

            quant_scales = load_scales(args.quant_scales)
            model_cfg = dataclasses.replace(
                cfg.model,
                backbone=dataclasses.replace(cfg.model.backbone, quant="int8"),
            )
        model = PETRDetector(model_cfg, deterministic=True)
        variables = model.init(
            jax.random.PRNGKey(0), batch["images"], batch["img2lidar"], batch["img_hw"],
            timestamp=batch.get("timestamp"),
        )
        def fwd_fn(p, b):
            v = {"params": p}
            if quant_scales is not None:
                v["quant"] = quant_scales
            out = model.apply(
                v, b["images"], b["img2lidar"], b["img_hw"],
                timestamp=b.get("timestamp"),
            )
            return out["cls_logits"].sum()

        params = variables["params"]
        compiled = jax.jit(fwd_fn).lower(params, batch).compile()

        def run(i=0):
            return float(compiled(params, batches[i % len(batches)]))

    for i in range(args.warmup):
        run(i)

    t0 = time.perf_counter()
    for i in range(args.iters):
        run(i)
    dt = time.perf_counter() - t0
    mode = "train" if args.train else "inference"

    from petr_tpu.utils.mfu import compiled_flops, mfu_fields

    flops = compiled_flops(compiled)
    if args.train and flops and cfg.train.grad_accum > 1:
        # XLA's cost analysis counts the grad-accum lax.scan BODY once;
        # scale to the true per-step work or MFU is understated by the
        # accumulation factor. Approximation: this also multiplies the
        # non-scanned tail (optimizer update, grad averaging, where-select),
        # slightly overcounting for accum > 1 — negligible next to the
        # fwd+bwd FLOPs the scan body holds.
        flops *= cfg.train.grad_accum
    fps = args.iters * B / dt
    print(
        json.dumps(
            {
                "metric": f"{args.config}_{mode}",
                "value": round(fps, 3),
                "unit": "samples/s",
                "ms_per_iter": round(1000 * dt / args.iters, 2),
                **mfu_fields(flops / B if flops else None, fps),
            }
        )
    )


if __name__ == "__main__":
    main()
