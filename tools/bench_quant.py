"""Flagship PETR-vov-p4-800x320 inference: int8 PTQ backbone vs bf16.

Same scan-chain protocol as bench.py (B=1, 6x320x800).
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import __graft_entry__ as ge
from petr_tpu.configs import get_config
from petr_tpu.models import PETRDetector
from petr_tpu.quant import calibrate_detector

SCAN_LEN = 20


def timed(apply_fn, args, iters=5):
    @jax.jit
    def chain(*a):
        def body(carry, _):
            out = apply_fn(a[0], a[1] + carry * 1e-12, *a[2:])
            return out["cls_logits"].sum().astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN_LEN)
        return carry

    float(chain(*args))
    float(chain(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(chain(*args))
    return (time.perf_counter() - t0) / (iters * SCAN_LEN) * 1e3


def main():
    cfg = get_config("petr_vov_p4_800x320")
    B, N, H, W = 1, 6, *cfg.data.image_size
    batches = [ge._batch(B, N, H, W, 8, seed=s) for s in range(2)]
    b = batches[0]

    model = PETRDetector(cfg.model, deterministic=True)
    params = model.init(
        jax.random.PRNGKey(0), b["images"], b["img2lidar"], b["img_hw"]
    )["params"]

    t_bf16 = timed(
        lambda p, im, m, hw: model.apply({"params": p}, im, m, hw),
        (params, b["images"], b["img2lidar"], b["img_hw"]),
    )
    print(f"bf16: {t_bf16:6.2f} ms/sample ({1e3 / t_bf16:5.1f} samples/s)")

    scales = calibrate_detector(cfg, params, batches)
    qcfg = dataclasses.replace(
        cfg.model, backbone=dataclasses.replace(cfg.model.backbone, quant="int8")
    )
    qmodel = PETRDetector(qcfg, deterministic=True)
    t_int8 = timed(
        lambda p, im, m, hw: qmodel.apply({"params": p, "quant": scales}, im, m, hw),
        (params, b["images"], b["img2lidar"], b["img_hw"]),
    )
    print(
        f"int8: {t_int8:6.2f} ms/sample ({1e3 / t_int8:5.1f} samples/s)"
        f"  speedup {t_bf16 / t_int8:4.2f}x"
    )


if __name__ == "__main__":
    main()
