"""Flagship inference throughput vs batch size on the real chip.

The reference protocol (`tools/analysis_tools/benchmark.py:64-91`) is batch-1
FPS — bench.py mirrors that. Serving deployments can batch; this sweep
reports samples/s/chip at batch 1/2/4/8 with the same RTT-amortized scan
protocol. One JSON line per batch size.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import __graft_entry__ as ge
from petr_tpu.configs import get_config
from petr_tpu.models import PETRDetector

SCAN_LEN = 20
CONFIG = "petr_vov_p4_800x320"


def bench_batch(cfg, model, params, B):
    N = cfg.data.num_views * cfg.data.num_frames
    H, W = cfg.data.image_size
    batch = ge._batch(B, N, H, W, cfg.data.max_gt)

    @jax.jit
    def chain(params, images, i2l, hw):
        def body(carry, _):
            out = model.apply({"params": params}, images + carry * 1e-12, i2l, hw)
            return out["cls_logits"].sum().astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN_LEN)
        return carry

    args = (params, batch["images"], batch["img2lidar"], batch["img_hw"])
    float(chain(*args))
    float(chain(*args))
    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        float(chain(*args))
    dt = (time.perf_counter() - t0) / (iters * SCAN_LEN)
    return {
        "config": CONFIG,
        "batch": B,
        "ms_per_step": round(dt * 1e3, 2),
        "samples_per_s_chip": round(B / dt, 2),
    }


def main():
    cfg = get_config(CONFIG)
    model = PETRDetector(cfg.model, deterministic=True)
    N = cfg.data.num_views
    H, W = cfg.data.image_size
    b1 = ge._batch(1, N, H, W, cfg.data.max_gt)
    params = model.init(
        jax.random.PRNGKey(0), b1["images"], b1["img2lidar"], b1["img_hw"]
    )["params"]
    for B in (1, 2, 4, 8):
        try:
            print(json.dumps(bench_batch(cfg, model, params, B)), flush=True)
        except Exception as e:
            print(json.dumps({"batch": B, "error": f"{type(e).__name__}: {str(e)[:160]}"}),
                  flush=True)


if __name__ == "__main__":
    main()
