"""Does eliminating the OSA concat buffer beat concat + 1x1 conv?

The OSA block (vovnet.py OSABlock) concatenates [x, c1..c5] (C_total =
in_ch + 5*stage_ch) and projects with a 1x1 conv. On TPU the concat is
materialized in HBM (conv operands can't be fusion inputs), costing
read(x_i) + write(concat) + read(concat) = 3*C_total bytes/px, vs
C_total for an algebraically identical sum of per-chunk matmuls
    y = sum_i x_i @ W_i   (+ BN affine + ReLU epilogue).

Benchmarks both at the real V-99 stage shapes of the flagship config
(6 views x 800x320 input). Timing uses the scan-chain protocol (host
value read per measurement; see bench.py docstring).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

SCAN_LEN = 30


def timed(fn, args, iters=6):
    @jax.jit
    def chain(*a):
        def body(carry, _):
            out = fn(a[0] + carry * 1e-12, *a[1:])
            return out.sum().astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN_LEN)
        return carry

    float(chain(*args))
    float(chain(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(chain(*args))
    return (time.perf_counter() - t0) / (iters * SCAN_LEN) * 1e3


def main():
    # (label, B, H, W, in_ch, stage_ch, out_ch, n_blocks)
    stages = [
        ("stage2", 6, 80, 200, 128, 128, 256, 1),
        ("stage3", 6, 40, 100, 256, 160, 512, 3),
        ("stage4", 6, 20, 50, 512, 192, 768, 9),
        ("stage5", 6, 10, 25, 768, 224, 1024, 3),
    ]
    K = 5
    rng = np.random.RandomState(0)
    total = {"concat": 0.0, "sum": 0.0}
    for label, B, H, W, cin, cs, cout, nblk in stages:
        chunks = [jnp.asarray(rng.randn(B, H, W, cin), jnp.bfloat16)] + [
            jnp.asarray(rng.randn(B, H, W, cs), jnp.bfloat16) for _ in range(K)
        ]
        ctot = cin + K * cs
        w = jnp.asarray(rng.randn(ctot, cout) * 0.02, jnp.bfloat16)
        mul = jnp.asarray(rng.rand(cout), jnp.float32)
        add = jnp.asarray(rng.randn(cout), jnp.float32)

        def concat_conv(x0, *rest):
            x = jnp.concatenate((x0,) + rest, axis=-1)
            y = jax.lax.dot_general(
                x, w, (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jnp.maximum(y * mul + add, 0.0).astype(jnp.bfloat16)

        splits = np.cumsum([cin] + [cs] * (K - 1))
        ws = jnp.split(w, splits, axis=0)

        def sum_matmuls(x0, *rest):
            xs = (x0,) + rest
            y = None
            for xi, wi in zip(xs, ws):
                p = jax.lax.dot_general(
                    xi, wi, (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                y = p if y is None else y + p
            return jnp.maximum(y * mul + add, 0.0).astype(jnp.bfloat16)

        t_c = timed(concat_conv, tuple(chunks))
        t_s = timed(sum_matmuls, tuple(chunks))
        total["concat"] += t_c * nblk
        total["sum"] += t_s * nblk
        px = B * H * W
        gb = px * ctot * 2 / 1e9
        print(
            f"{label}: px={px} ctot={ctot} concat-buffer={gb*1000:.0f}MB  "
            f"concat+1x1 {t_c:.3f} ms  sum-of-matmuls {t_s:.3f} ms  "
            f"({t_c/t_s:.2f}x) x{nblk} blocks"
        )
    print(
        f"whole-backbone projection: concat {total['concat']:.2f} ms -> "
        f"sum {total['sum']:.2f} ms ({total['concat']/total['sum']:.2f}x)"
    )


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
