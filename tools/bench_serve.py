"""Serving-stack throughput: InferenceServer over the flagship model.

Measures end-to-end request throughput (host numpy in -> decoded boxes out,
including micro-batching, host<->device transfer, and decode) at several
server batch sizes. This is the deployment-facing number; bench.py reports
the device-only forward rate.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    import __graft_entry__ as ge
    from petr_tpu.configs import get_config
    from petr_tpu.models import PETRDetector
    from petr_tpu.serve import InferenceServer, make_serving_fn

    cfg = get_config("petr_vov_p4_800x320")
    H, W = cfg.data.image_size
    b = ge._batch(1, 6, H, W, 8)
    model = PETRDetector(cfg.model, deterministic=True)
    params = model.init(
        jax.random.PRNGKey(0), b["images"], b["img2lidar"], b["img_hw"]
    )["params"]
    fn = make_serving_fn(cfg)

    samples = [
        {
            k: np.asarray(ge._batch(1, 6, H, W, 8, seed=s)[k])[0]
            for k in ("images", "img2lidar", "img_hw")
        }
        for s in range(8)
    ]

    REQS = 64
    for bs in (1, 2, 4):
        jfn = jax.jit(lambda p, *a: fn(p, *a))
        call = lambda *a: jfn(params, *a)
        with InferenceServer(call, batch_size=bs, max_delay_ms=20.0) as srv:
            # warmup (compile at this batch size)
            srv.submit(samples[0]).result(timeout=1200)
            t0 = time.perf_counter()
            futs = [srv.submit(samples[i % len(samples)]) for i in range(REQS)]
            for f in futs:
                f.result(timeout=1200)
            dt = time.perf_counter() - t0
        print(
            f"server batch={bs}: {REQS / dt:6.1f} requests/s "
            f"({1e3 * dt / REQS:.1f} ms/request end-to-end)"
        )


if __name__ == "__main__":
    main()
