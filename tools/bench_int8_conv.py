"""Does XLA:TPU hit the MXU int8 path for conv at VoVNet shapes?

Times bf16 conv vs int8 conv (int32 accumulation) at representative
stage shapes. If int8 approaches 2x bf16, a PTQ serving path is worth it.

Measured (v5e, isolated; small shapes are overhead-dominated so treat
ratios only as a lower bound): 3x3 stage convs ~1.05x, concat 1x1s
1.02-1.11x, compute-bound big 1x1 (1024->1024 @40x100) 1.43x. Stage-level
dataflow test (bench_int8_stage.py): 1.20x.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

SCAN_LEN = 30


def timed(fn, *args, iters=4):
    jfn = jax.jit(fn)

    def chain(*a):
        def step(c, _):
            x = a[0]
            if jnp.issubdtype(x.dtype, jnp.integer):
                xx = x + c.astype(x.dtype)
            else:
                xx = x + c.astype(x.dtype) * 1e-12
            return jnp.sum(jfn(xx, *a[1:]).astype(jnp.float32)), None

        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=SCAN_LEN)
        return c

    cj = jax.jit(chain)
    float(cj(*args))
    float(cj(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(cj(*args))
    return (time.perf_counter() - t0) / (iters * SCAN_LEN) * 1e3


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if jnp.issubdtype(x.dtype, jnp.integer) else jnp.float32,
    )


SHAPES = [
    # (name, B,H,W,Cin,Cout,k,stride)
    ("stage3 conv", 6, 40, 100, 160, 160, 3, 1),
    ("stage4 conv", 6, 20, 50, 192, 192, 3, 1),
    ("s3 concat", 6, 40, 100, 1056, 512, 1, 1),
    ("s4 concat", 6, 20, 50, 1472, 768, 1, 1),
    ("stage2 conv", 6, 80, 200, 128, 128, 3, 1),
    ("big 1x1", 6, 40, 100, 1024, 1024, 1, 1),
]


def main():
    rng = np.random.RandomState(0)
    for name, B, H, W, Ci, Co, k, s in SHAPES:
        gf = 2 * B * (H // s) * (W // s) * Ci * Co * k * k / 1e9
        xb = jnp.asarray(rng.randn(B, H, W, Ci), jnp.bfloat16)
        wb = jnp.asarray(rng.randn(k, k, Ci, Co) * 0.05, jnp.bfloat16)
        tb = timed(lambda x, w: conv(x, w, s), xb, wb)
        xi = jnp.asarray(rng.randint(-127, 127, (B, H, W, Ci)), jnp.int8)
        wi = jnp.asarray(rng.randint(-127, 127, (k, k, Ci, Co)), jnp.int8)
        ti = timed(lambda x, w: conv(x, w, s), xi, wi)
        print(
            f"{name:12s} {gf:7.1f} GF  bf16 {tb:6.3f} ms ({gf/tb:6.1f} TF/s)"
            f"  int8 {ti:6.3f} ms ({gf/ti:6.1f} TF/s)  speedup {tb/ti:4.2f}x"
        )


if __name__ == "__main__":
    main()
