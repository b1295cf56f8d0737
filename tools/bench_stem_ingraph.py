"""In-graph stem cost: full VoVNet vs stages-only (stem precomputed).

The difference is what a fused stem kernel can actually recover.

Measured (v5e, 6x320x800 bf16, remat off):
    full backbone 14.81 ms, stages-only 14.49 ms -> stem costs 0.32 ms
    in-graph. XLA pipelines the stem fine; isolated stem benches (~2.4 ms)
    are dominated by per-program overhead. Conclusion: no fused-stem kernel.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import flax.linen as nn

from petr_tpu.models.vovnet import SPECS, ConvBNReLU, OSABlock, VoVNet

DT = jnp.bfloat16
SCAN_LEN = 30


def timed(fn, params, x, iters=4):
    jfn = jax.jit(fn)

    def chain(p, x):
        def step(c, _):
            out = jfn(p, x + c.astype(x.dtype) * 1e-12)
            return sum(jnp.sum(o).astype(jnp.float32) for o in jax.tree.leaves(out)), None

        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=SCAN_LEN)
        return c

    cj = jax.jit(chain)
    float(cj(params, x))
    float(cj(params, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(cj(params, x))
    return (time.perf_counter() - t0) / (iters * SCAN_LEN) * 1e3


class Stages(nn.Module):
    """VoVNet stages 2-5 (no stem)."""

    @nn.compact
    def __call__(self, x):
        spec = SPECS["V-99-eSE"]
        outs = []
        for stage in range(4):
            if stage > 0:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
            for b in range(spec["block_per_stage"][stage]):
                x = OSABlock(
                    spec["stage_conv_ch"][stage],
                    spec["stage_out_ch"][stage],
                    spec["layer_per_block"],
                    b > 0,
                    True,
                    DT,
                    name=f"stage{stage + 2}_block{b}",
                )(x)
            if stage in (2, 3):
                outs.append(x)
        return tuple(outs)


def main():
    rng = np.random.RandomState(0)
    B, H, W = 6, 320, 800
    x = jnp.asarray(rng.randn(B, H, W, 3), DT)

    full = VoVNet(spec="V-99-eSE", out_indices=(2, 3), remat=False, dtype=DT)
    p = full.init(jax.random.PRNGKey(0), x)["params"]
    t_full = timed(lambda p, x: full.apply({"params": p}, x), p, x)
    print(f"full backbone     : {t_full:6.3f} ms")

    xs = jnp.asarray(rng.randn(B, 80, 200, 128), DT)
    stages = Stages()
    ps = stages.init(jax.random.PRNGKey(0), xs)["params"]
    t_stages = timed(lambda p, x: stages.apply({"params": p}, x), ps, xs)
    print(f"stages-only       : {t_stages:6.3f} ms")
    print(f"in-graph stem cost: {t_full - t_stages:6.3f} ms")


if __name__ == "__main__":
    main()
