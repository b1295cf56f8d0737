"""Inference benchmark across every config family on the real chip.

RTT-amortized protocol (scan-chained forwards, one host value read), batch 1,
matching `bench.py`. Prints one JSON line per config.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import __graft_entry__ as ge
from petr_tpu.configs import get_config, list_configs
from petr_tpu.models import PETRDetector

SCAN_LEN = 20


def bench_config(name):
    cfg = get_config(name)
    model = PETRDetector(cfg.model, deterministic=True)
    B = 1
    N = cfg.data.num_views * cfg.data.num_frames
    H, W = cfg.data.image_size
    is_depthr = cfg.model.head.kind == "depthr"
    batch = ge._batch(B, N, H, W, cfg.data.max_gt, with_ts=cfg.data.num_frames > 1)
    kwargs = dict(timestamp=batch.get("timestamp"))
    if is_depthr:
        kwargs.update(
            gt_boxes=batch["gt_boxes"], gt_valid=batch["gt_valid"],
            lidar2img=jnp.linalg.inv(batch["img2lidar"].astype(jnp.float64)).astype(jnp.float32),
        )
    variables = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["img2lidar"], batch["img_hw"], **kwargs
    )
    params = variables["params"]

    @jax.jit
    def forward_chain(params, batch):
        def body(carry, _):
            out = model.apply(
                {"params": params},
                batch["images"] + carry * 1e-12,
                batch["img2lidar"],
                batch["img_hw"],
                **kwargs,
            )
            return out["cls_logits"].sum().astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN_LEN)
        return carry

    def run():
        return float(forward_chain(params, batch))

    run()
    run()
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / (iters * SCAN_LEN)
    return {
        "config": name,
        "ms_per_sample": round(dt * 1e3, 2),
        "samples_per_s_chip": round(1.0 / dt, 2),
    }


def main():
    names = sys.argv[1:] or [c for c in list_configs() if not c.startswith("tiny")]
    for name in names:
        try:
            print(json.dumps(bench_config(name)), flush=True)
        except Exception as e:
            print(json.dumps({"config": name, "error": f"{type(e).__name__}: {str(e)[:200]}"}), flush=True)


if __name__ == "__main__":
    main()
