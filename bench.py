"""Benchmark: flagship PETR-vov-p4-800x320 inference throughput on one chip.

Protocol mirrors the reference's `tools/analysis_tools/benchmark.py:64-91`
(sty61010/PETR): warmup 5 iterations, synchronized timing, fps = samples/s
(one sample = 6 camera images at 320x800).

Baseline derivation: the reference publishes no FPS; its val-eval wall times
(6019 samples in ~200-313 s on 8 GPUs, config comments) imply ~2.4-3.8
samples/s per 2080Ti. vs_baseline is reported against 3.0 samples/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from petr_tpu.configs import get_config
    from petr_tpu.models import PETRDetector

    cfg = get_config("petr_vov_p4_800x320")
    model = PETRDetector(cfg.model, deterministic=True)
    B, N, H, W = 1, 6, *cfg.data.image_size
    # distinct input batches, synced per iteration — identical async dispatches
    # can be coalesced by the runtime and undercount wall time
    batches = [ge._batch(B, N, H, W, 8, seed=s) for s in range(4)]
    batch = batches[0]
    variables = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["img2lidar"], batch["img_hw"]
    )
    params = variables["params"]

    # Timing protocol notes (measured on this setup):
    #  * block_until_ready resolves BEFORE true completion under the
    #    remote-execution relay -> must read a host VALUE.
    #  * one host round trip costs ~28 ms -> chain SCAN_LEN forwards inside
    #    one jit (data-dependent via a carry perturbation so nothing hoists)
    #    and amortize the RTT to <2% of the measurement.
    SCAN_LEN = 20

    def forward_chain(params, images, img2lidar, img_hw):
        def body(carry, _):
            out = model.apply(
                {"params": params}, images + carry * 1e-12, img2lidar, img_hw
            )
            return out["cls_logits"].sum().astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN_LEN)
        return carry

    # AOT compile so the same executable serves timing AND cost analysis
    compiled = jax.jit(forward_chain).lower(
        params, batch["images"], batch["img2lidar"], batch["img_hw"]
    ).compile()

    def run(i):
        b = batches[i % len(batches)]
        return float(compiled(params, b["images"], b["img2lidar"], b["img_hw"]))

    # warmup (includes compile)
    for i in range(2):
        run(i)

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        run(i)
    dt = time.perf_counter() - t0

    fps = iters * SCAN_LEN * B / dt
    baseline = 3.0  # samples/s per reference GPU (see module docstring)

    # MFU: achieved TFLOP/s vs the chip's peak matmul rate (falsifiable
    # "fast"; regressions show up as mfu_pct drops). Two flop bases exist;
    # BENCH_r*.json must be cross-round comparable, so the PRIMARY mfu_pct
    # uses the CANONICAL count: the unoptimized lowering of one forward
    # with the Pallas flash kernel swapped for its XLA-attention equivalent
    # (identical math — the flash path is parity-tested against it; Pallas
    # calls refuse CPU lowering from an axon process and their flops are
    # invisible to XLA cost analysis anyway). The optimized-HLO count of
    # an AOT compile of a single forward (same model/shapes as the timed
    # chain) is reported alongside as optimized_gflops/mfu_pct_optimized;
    # it includes XLA-introduced padding/layout work, so it flatters.
    import dataclasses

    from petr_tpu.utils.mfu import (
        compiled_flops, device_peak_tflops, lowered_flops, mfu_fields,
    )

    model_canon = PETRDetector(
        dataclasses.replace(cfg.model, use_flash_attention=False),
        deterministic=True,
    )

    def forward_canon(params, images, img2lidar, img_hw):
        out = model_canon.apply({"params": params}, images, img2lidar, img_hw)
        return out["cls_logits"].sum().astype(jnp.float32)

    canon_flops = lowered_flops(
        forward_canon, params, batch["images"], batch["img2lidar"], batch["img_hw"]
    )

    def forward_one(params, images, img2lidar, img_hw):
        out = model.apply({"params": params}, images, img2lidar, img_hw)
        return out["cls_logits"].sum().astype(jnp.float32)

    opt_flops = compiled_flops(
        jax.jit(forward_one)
        .lower(params, batch["images"], batch["img2lidar"], batch["img_hw"])
        .compile()
    )
    extra = {}
    peak = device_peak_tflops()
    if opt_flops and peak:
        extra = {
            "optimized_gflops": round(opt_flops / B / 1e9, 1),
            "mfu_pct_optimized": round(100.0 * opt_flops / B * fps / 1e12 / peak, 1),
        }
    print(
        json.dumps(
            {
                "metric": "petr_vov_p4_800x320_inference",
                "value": round(fps, 3),
                "unit": "samples/s/chip",
                "vs_baseline": round(fps / baseline, 3),
                **mfu_fields(canon_flops / B if canon_flops else None, fps),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
