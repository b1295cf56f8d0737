"""Stage-level VoVNet timing + batch-scaling probe on the real chip."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

sys.path.insert(0, "/root/repo")
from petr_tpu.models.layers import ConvBNReLU
from petr_tpu.models.vovnet import SPECS, OSABlock, VoVNet

SCAN_LEN = 20
DT = jnp.bfloat16


def timed(fn, *args, iters=5):
    jfn = jax.jit(fn)
    float(jfn(*args))
    float(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jfn(*args))
    return (time.perf_counter() - t0) / (iters * SCAN_LEN) * 1e3


def chain(apply_fn):
    def fn(p, x):
        def step(carry, _):
            out = apply_fn(p, x + carry.astype(x.dtype))
            return out.sum().astype(jnp.float32), None

        carry, _ = jax.lax.scan(step, jnp.float32(0), None, length=SCAN_LEN)
        return carry

    return fn


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
                name=f"b{b}",
            )(x)
        return x


def main():
    rng = jax.random.PRNGKey(0)
    B, H, W = 6, 320, 800
    x = jnp.asarray(np.random.RandomState(0).randn(B, H, W, 3), DT)

    stem = Stem()
    p = stem.init(rng, x)["params"]
    print(f"stem   in {x.shape}: {timed(chain(lambda p, x: stem.apply({'params': p}, x)), p, x):7.2f} ms", flush=True)
    x = stem.apply({"params": p}, x)

    for s in range(4):
        st = Stage(s)
        p = st.init(rng, x)["params"]
        ms = timed(chain(lambda p, x, st=st: st.apply({"params": p}, x)), p, x)
        print(f"stage{s+2} in {x.shape}: {ms:7.2f} ms", flush=True)
        x = st.apply({"params": p}, x)

    # batch scaling of the whole backbone
    bb = VoVNet(spec="V-99-eSE", out_indices=(2, 3), remat=False, dtype=DT)
    for B in (6, 12, 24, 48):
        xs = jnp.asarray(np.random.RandomState(0).randn(B, H, W, 3), DT)
        p = bb.init(rng, xs)["params"]
        ms = timed(
            chain(lambda p, x: sum(o.sum() for o in bb.apply({"params": p}, x)).reshape(1, 1)),
            p,
            xs,
            iters=3,
        )
        print(f"backbone batch {B:2d} ({B//6} samples): {ms:7.2f} ms  -> {B/6/ms*1e3:6.1f} samples/s", flush=True)


if __name__ == "__main__":
    main()
