"""Per-stage roofline microbench of the VoVNet-99 backbone on TPU.

Times the stem and each stage in isolation (scan-chain protocol, bf16),
reports ms, GFLOPs, and achieved TFLOP/s so the laggard stages stand out.

Measured (v5e, 6x320x800 bf16):
    stem   :  2.369 ms   44.8 GF   18.9 TF/s   <- isolated only; see below
    stage2 :  2.502 ms  184.5 GF   73.8 TF/s
    stage3 :  5.230 ms  321.4 GF   61.4 TF/s   (Cout=160 pads to 256 lanes)
    stage4 :  6.390 ms  463.9 GF   72.6 TF/s
    stage5 :  1.547 ms   64.3 GF   41.5 TF/s   (small 10x25 plane)

CAUTION: isolated small-shape timings carry a large per-program overhead on
this setup. `bench_stem_ingraph.py` shows the stem costs only ~0.32 ms
in-graph (full backbone minus stages-only), so stem-level Pallas fusion is
NOT worth it; the stage OSA convs at ~60-74 TF/s (31-37% of v5e bf16 peak,
with 160/192-lane Cout padding) are the real floor.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import flax.linen as nn

from petr_tpu.models.vovnet import SPECS, ConvBNReLU, OSABlock

DT = jnp.bfloat16
SCAN_LEN = 30


def timed(make_fn, params, x, iters=4):
    jfn = jax.jit(make_fn)

    def chain(p, x):
        def step(c, _):
            return jnp.sum(jfn(p, x + c.astype(x.dtype))).astype(jnp.float32), None

        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=SCAN_LEN)
        return c

    cj = jax.jit(chain)
    float(cj(params, x))
    float(cj(params, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(cj(params, x))
    return (time.perf_counter() - t0) / (iters * SCAN_LEN) * 1e3


class Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(64, 3, 2, dtype=DT, name="stem1")(x)
        x = ConvBNReLU(64, 3, 1, dtype=DT, name="stem2")(x)
        x = ConvBNReLU(128, 3, 2, dtype=DT, name="stem3")(x)
        return x


class Stage(nn.Module):
    stage: int

    @nn.compact
    def __call__(self, x):
        spec = SPECS["V-99-eSE"]
        if self.stage > 0:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
        for b in range(spec["block_per_stage"][self.stage]):
            x = OSABlock(
                spec["stage_conv_ch"][self.stage],
                spec["stage_out_ch"][self.stage],
                spec["layer_per_block"],
                b > 0,
                True,
                DT,
                name=f"blk{b}",
            )(x)
        return x


def conv_flops(params, tree_path=""):
    # rough: counted via XLA cost analysis per module below instead
    pass


def cost_gflops(fn, params, x):
    lowered = jax.jit(fn).lower(params, x)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca.get("flops", 0.0) / 1e9


def main():
    B, H, W = 6, 320, 800
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, 3), DT)

    stem = Stem()
    p = stem.init(jax.random.PRNGKey(0), x)["params"]
    fn = lambda p, x: stem.apply({"params": p}, x)
    g = cost_gflops(fn, p, x)
    ms = timed(fn, p, x)
    print(f"stem   : {ms:7.3f} ms  {g:8.1f} GF  {g / ms:7.1f} TF/s")
    x = jnp.asarray(fn(p, x))

    for stage in range(4):
        m = Stage(stage)
        p = m.init(jax.random.PRNGKey(0), x)["params"]
        fn = lambda p, x, m=m: m.apply({"params": p}, x)
        g = cost_gflops(fn, p, x)
        ms = timed(fn, p, x)
        print(f"stage{stage + 2} : {ms:7.3f} ms  {g:8.1f} GF  {g / ms:7.1f} TF/s  in={x.shape}")
        x = jnp.asarray(fn(p, x))


if __name__ == "__main__":
    main()
