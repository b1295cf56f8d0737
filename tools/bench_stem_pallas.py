"""Stem-shape conv: Pallas im2col conv3x3 vs XLA conv at 64-ch 160x400.

Also times a fused 3-conv stem chain (stride-2 convs stay XLA; the stride-1
stem2 uses the Pallas kernel) against the all-XLA stem.

Needs LIBTPU_INIT_ARGS="--xla_tpu_scoped_vmem_limit_kib=65536" (the
whole-plane kernel exceeds the 16M scoped-vmem default at 160x400x64).
Measured (v5e): Pallas == XLA isolated (2.23 vs 2.25 ms, both overhead
-dominated), Pallas LOSES in-chain (4.09 vs 2.85 ms). With
bench_stem_ingraph.py showing 0.32 ms true in-graph stem cost, the stem is
a non-target.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from petr_tpu.ops.pallas.conv3x3 import conv3x3_bn_relu

SCAN_LEN = 30


def timed(fn, *args, iters=4):
    jfn = jax.jit(fn)

    def chain(*a):
        def step(c, _):
            return jnp.sum(jfn(a[0] + c.astype(a[0].dtype) * 1e-12, *a[1:]).astype(jnp.float32)), None

        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=SCAN_LEN)
        return c

    cj = jax.jit(chain)
    float(cj(*args))
    float(cj(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(cj(*args))
    return (time.perf_counter() - t0) / (iters * SCAN_LEN) * 1e3


def xla_conv(x, w, stride=1, relu=True):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = jnp.maximum(y, 0) if relu else y
    return y.astype(x.dtype)


def main():
    rng = np.random.RandomState(0)
    B, H, W, C = 6, 160, 400, 64
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)
    mul = jnp.ones((C,), jnp.bfloat16)
    add = jnp.zeros((C,), jnp.bfloat16)

    y0 = xla_conv(x, w)
    y1 = conv3x3_bn_relu(x, w, mul, add, relu=True)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
    print("stem2 max abs diff:", err)

    t_x = timed(lambda x: xla_conv(x, w), x)
    t_p = timed(lambda x: conv3x3_bn_relu(x, w, mul, add, relu=True), x)
    gf = 2 * B * H * W * C * C * 9 / 1e9
    print(f"stem2 XLA   : {t_x:6.3f} ms ({gf/t_x:5.1f} TF/s)")
    print(f"stem2 Pallas: {t_p:6.3f} ms ({gf/t_p:5.1f} TF/s)")

    # full stem chain
    x0 = jnp.asarray(rng.randn(6, 320, 800, 3), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(3, 3, 3, 64) * 0.1, jnp.bfloat16)
    w2 = w
    w3 = jnp.asarray(rng.randn(3, 3, 64, 128) * 0.05, jnp.bfloat16)

    def stem_xla(x):
        x = xla_conv(x, w1, 2)
        x = xla_conv(x, w2, 1)
        return xla_conv(x, w3, 2)

    def stem_mixed(x):
        x = xla_conv(x, w1, 2)
        x = conv3x3_bn_relu(x, w2, mul, add, relu=True)
        return xla_conv(x, w3, 2)

    t_sx = timed(stem_xla, x0)
    t_sm = timed(stem_mixed, x0)
    print(f"stem all-XLA      : {t_sx:6.3f} ms")
    print(f"stem Pallas-stem2 : {t_sm:6.3f} ms")


if __name__ == "__main__":
    main()
