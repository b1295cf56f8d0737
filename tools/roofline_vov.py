"""Per-conv-shape roofline of the VoVNet-99 backbone: measured XLA conv rate
vs (a) a pure-GEMM of the identical implicit-GEMM shape and (b) the analytic
MXU padding bound — the falsifiability artifact for the flagship's backbone
MFU (VERDICT r2 #1: either land a batch-1 win or prove the tiling ceiling).

Protocol: each measurement chains `GROUP` independent ops (distinct weights,
carry-perturbed inputs) inside each of `SCAN_LEN` scan iterations, one host
value read per run — the per-iteration relay floor (~0.5 ms) is amortized
over GROUP ops, so even 10x25-spatial stage-5 convs are measured cleanly.

Analytic bound (v5e, bf16, 128x128 MXU, 8-row sublane tiles):
    eff = (M/ceil8(M)) * (K/ceil128(K)) * (N/ceil128(N))
with K = 9*Cin for a 3x3 conv **if** XLA contracts the full im2col axis; a
spatial-loop lowering (9 accumulated Cin-contractions) pads each Cin to 128
instead — `K_alt`. Comparing the measured conv rate against GEMM(M,K,N),
GEMM(M,K_alt-ish) and the two bounds tells us which lowering XLA picked and
whether a hand-written kernel has any headroom left.

Usage (TPU):  PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline_vov.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

DT = jnp.bfloat16
SCAN_LEN = 20
GROUP = 8
PEAK_TFLOPS = 197.0  # v5e bf16


def ceil_to(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------- inventory
# (name, B, H, W, Cin, Cout, ksize, count) for V-99-eSE at 6 x 320x800.
# count = how many times this exact conv shape runs in one forward.
# ANCHORS: the dominant per-stage shapes (the chained 3x3s are 60-80% of
# each stage's flops; one concat 1x1 anchors that family). Each measured
# shape costs ~2 relay compiles, so the full 17-shape inventory (kept in
# comments) is opt-in via --full.
def conv_inventory(full=False):
    B = 6
    anchors = [
        ("s2.convN", B, 80, 200, 128, 128, 3, 5),
        ("s3.convN", B, 40, 100, 160, 160, 3, 12),
        ("s4.convN", B, 20, 50, 192, 192, 3, 36),
        ("s5.convN", B, 10, 25, 224, 224, 3, 12),
        ("s4.b18.concat", B, 20, 50, 1728, 768, 1, 8),
        ("s5.b12.concat", B, 10, 25, 2144, 1024, 1, 2),
    ]
    if not full:
        return anchors
    return anchors + [
        ("s2.concat", B, 80, 200, 768, 256, 1, 1),
        ("s3.b0.conv0", B, 40, 100, 256, 160, 3, 1),
        ("s3.b12.conv0", B, 40, 100, 512, 160, 3, 2),
        ("s3.b0.concat", B, 40, 100, 1056, 512, 1, 1),
        ("s3.b12.concat", B, 40, 100, 1312, 512, 1, 2),
        ("s4.b0.conv0", B, 20, 50, 512, 192, 3, 1),
        ("s4.b18.conv0", B, 20, 50, 768, 192, 3, 8),
        ("s4.b0.concat", B, 20, 50, 1472, 768, 1, 1),
        ("s5.b0.conv0", B, 10, 25, 768, 224, 3, 1),
        ("s5.b12.conv0", B, 10, 25, 1024, 224, 3, 2),
        ("s5.b0.concat", B, 10, 25, 1888, 1024, 1, 1),
    ]


# ---------------------------------------------------------------- timing
def _chain_time(op, xs, ws, iters=4):
    """Time ``op(x, w)`` over GROUP distinct (x, w) pairs per scan iteration
    (carry-perturbed inputs so nothing hoists; arrays passed as ARGUMENTS —
    embedded constants would trip the relay's module-size limit). Returns
    seconds per single op instance."""

    def chain(c0, xs, ws):
        def step(c, _):
            s = jnp.float32(0)
            for x, w in zip(xs, ws):
                s = s + op(x + c.astype(x.dtype), w).astype(jnp.float32)
            return s * 1e-20, None

        c, _ = jax.lax.scan(step, c0, None, length=SCAN_LEN)
        return c

    cj = jax.jit(chain)
    args = (jnp.float32(0), xs, ws)
    float(cj(*args))
    float(cj(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(cj(*args))
    dt = time.perf_counter() - t0
    return dt / (iters * SCAN_LEN * len(xs))


def _conv_op(x, w):
    return jnp.sum(
        jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
    )


def _gemm_op(x, w):
    return jnp.sum(jnp.dot(x, w, preferred_element_type=jnp.float32))


def time_conv(B, H, W, Cin, Cout, k):
    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randn(B, H, W, Cin), DT) for _ in range(GROUP)]
    ws = [jnp.asarray(rng.randn(k, k, Cin, Cout) * 0.05, DT) for _ in range(GROUP)]
    return _chain_time(_conv_op, xs, ws)


def time_gemm(M, K, N):
    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randn(M, K), DT) for _ in range(GROUP)]
    ws = [jnp.asarray(rng.randn(K, N) * 0.05, DT) for _ in range(GROUP)]
    return _chain_time(_gemm_op, xs, ws)


HBM_GBPS = 819.0  # v5e


def main():
    full = "--full" in sys.argv
    print(f"devices: {jax.devices()}", flush=True)

    # Practical-MXU calibration: the achievable ceiling on THIS chip/runtime
    # for large, perfectly-shaped bf16 GEMMs. MFU quoted against the paper
    # peak (197) hides how much of the gap is the runtime's, not the model's.
    for M, K, N in ((4096, 4096, 4096), (8192, 2048, 2048)):
        g = 2.0 * M * K * N / 1e9
        t = time_gemm(M, K, N)
        print(f"calib {M}x{K}x{N}: {t*1e3:7.3f}ms  {g/t/1e3:6.1f} TF/s "
              f"({100*g/t/1e3/PEAK_TFLOPS:4.1f}% of paper peak)", flush=True)

    for name, B, H, W, Cin, Cout, k, count in conv_inventory(full):
        M, K, N = B * H * W, k * k * Cin, Cout
        gflops = 2.0 * M * K * N / 1e9
        t_conv = time_conv(B, H, W, Cin, Cout, k)
        t_gemm = time_gemm(M, K, N)
        eff_pad = (M / ceil_to(M, 8)) * (K / ceil_to(K, 128)) * (N / ceil_to(N, 128))
        # HBM roofline: a conv streams x once (M*Cin, NOT the 9x im2col
        # expansion), weights once, writes the output once (bf16). NB the
        # same-shape pure GEMM reads a MATERIALIZED (M, K) operand — 9x the
        # bytes for 3x3 — so its own bw-bound is much lower; that is why
        # XLA conv can legitimately beat the "equivalent" GEMM.
        bytes_moved = 2.0 * (M * Cin + K * N + M * N)
        bw_bound = gflops / (bytes_moved / (HBM_GBPS * 1e9)) / 1e3  # TF/s
        attainable = min(PEAK_TFLOPS * eff_pad, bw_bound)
        print(
            f"{name:14s} M={M:6d} K={K:5d} N={N:4d} {gflops:7.2f}GF x{count:2d} "
            f"conv {t_conv*1e3:7.3f}ms ({gflops/t_conv/1e3:6.1f} TF/s)  "
            f"gemm {t_gemm*1e3:7.3f}ms ({gflops/t_gemm/1e3:6.1f} TF/s)  "
            f"pad-bound {PEAK_TFLOPS*eff_pad:5.1f}  bw-bound {bw_bound:6.1f}  "
            f"attainable {attainable:6.1f}  conv/attainable "
            f"{gflops/t_conv/1e3/attainable:4.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
