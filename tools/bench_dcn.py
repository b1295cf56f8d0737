"""Drive + benchmark the Pallas DCNv2 kernel vs the XLA formulation on TPU.

Shapes = the r50dcn configs' DCN sites at 512x1408 input (SURVEY.md §2.9):
res4 stride-16 plane 32x88xC256, res5 stride-32 plane 16x44xC512, 6 views.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from petr_tpu.ops.dcn import modulated_deform_conv
from petr_tpu.ops.pallas.dcn import modulated_deform_conv_pallas

SCAN_LEN = 20


def timed(fn, *args, iters=5):
    jfn = jax.jit(fn)

    def chain(*a):
        def step(c, _):
            out = jfn(a[0] + c.astype(a[0].dtype), *a[1:])
            return jnp.sum(out).astype(jnp.float32), None

        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=SCAN_LEN)
        return c

    cj = jax.jit(chain)
    float(cj(*args))
    float(cj(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(cj(*args))
    return (time.perf_counter() - t0) / (iters * SCAN_LEN) * 1e3


def main():
    rng = np.random.RandomState(0)
    for name, (B, H, W, C) in [
        ("res4 6x32x88x256", (6, 32, 88, 256)),
        ("res5 6x16x44x512", (6, 16, 44, 512)),
    ]:
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        off_mask = jnp.asarray(rng.randn(B, H, W, 27) * 1.5, jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.float32)

        ref = jax.jit(modulated_deform_conv)(x, off_mask, w)
        for strategy in ("gather", "onehot"):
            try:
                out = jax.jit(
                    lambda x, o, w, s=strategy: modulated_deform_conv_pallas(x, o, w, 1, 1, s)
                )(x, off_mask, w)
                err = float(
                    jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
                ) / max(1e-6, float(jnp.max(jnp.abs(ref.astype(jnp.float32)))))
                t = timed(
                    lambda x, o, w, s=strategy: modulated_deform_conv_pallas(x, o, w, 1, 1, s),
                    x, off_mask, w,
                )
                print(f"{name} pallas[{strategy}]: {t:7.3f} ms  rel_err={err:.2e}", flush=True)
            except Exception as e:
                print(f"{name} pallas[{strategy}]: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        t_ref = timed(modulated_deform_conv, x, off_mask, w)
        print(f"{name} xla gather      : {t_ref:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
