"""XLA conv3x3 vs fused-im2col Pallas kernel at the OSA shapes.

Timing protocol: chain the op on its own output inside one jit (Cin==Cout,
so conv(conv(...)) 50 deep) — per-step cost is the op alone, no carry
traffic. One host value read at the end (relay RTT amortized).
"""

import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16
SCAN_LEN = 50


def timed_chain(op, x, iters=5):
    def chain(x):
        def step(c, _):
            return op(c), None

        c, _ = jax.lax.scan(step, x, None, length=SCAN_LEN)
        return jnp.sum(c.astype(jnp.float32))

    cj = jax.jit(chain)
    float(cj(x))
    float(cj(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(cj(x))
    return (time.perf_counter() - t0) / (iters * SCAN_LEN) * 1e3


def main():
    from petr_tpu.ops.pallas.conv3x3 import conv3x3_bn_relu

    rng = np.random.RandomState(0)
    cases = [
        ("s2 128ch 80x200", 6, 80, 200, 128),
        ("s3 160ch 40x100", 6, 40, 100, 160),
        ("s4 192ch 20x50", 6, 20, 50, 192),
        ("s5 224ch 10x25", 6, 10, 25, 224),
    ]
    for name, B, H, W, C in cases:
        x = jnp.asarray(rng.randn(B, H, W, C), DT)
        # scale keeps repeated application bounded-ish; exact value irrelevant
        w = jnp.asarray(rng.randn(3, 3, C, C) * (1.0 / np.sqrt(9 * C)), DT)
        mul = jnp.asarray(np.full(C, 1.0), jnp.float32)
        add = jnp.asarray(np.zeros(C), jnp.float32)
        gflop = 2 * B * H * W * 9 * C * C / 1e9

        def conv(x, w=w, mul=mul, add=add):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            return jnp.maximum(y * mul + add, 0.0).astype(DT)

        def pallas_conv(x, w=w, mul=mul, add=add):
            return conv3x3_bn_relu(x, w, mul, add, True)

        ref = jax.jit(conv)(x)
        out = jax.jit(pallas_conv)(x)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))) / (
            float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
        )
        t_conv = timed_chain(conv, x)
        t_pl = timed_chain(pallas_conv, x)
        print(
            f"{name:18s}: xla {t_conv:6.3f} ms ({gflop/t_conv:5.1f} TF/s) | "
            f"pallas {t_pl:6.3f} ({gflop/t_pl:5.1f}) | "
            f"speedup {t_conv/t_pl:4.2f}x  rel_err={err:.1e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
