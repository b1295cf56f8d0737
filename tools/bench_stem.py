"""Prototype: space-to-depth packing of the VoVNet stem conv (3x3/2, 3ch).

conv3x3/s2(x)[i,j] = sum_{ky,kx in 0..2} w[ky,kx] x[2i+ky-1, 2j+kx-1]
Pack x into 4x4 cells: P[a,b,(dy,dx,c)] = x[4a+dy, 4b+dx, c]. Each packed
cell (a,b) owns output pixels (2a+{0,1}, 2b+{0,1}); their joint footprint is
x rows 4a-1..4a+3, cols 4b-1..4b+3 -> packed cells (a-1..a, b-1..b) ... i.e.
a 2x2 packed conv with 48 input channels and 4*64 outputs, then
depth-to-space. Exact same arithmetic, MXU-aligned shapes.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16
SCAN_LEN = 50


def timed(fn, *args, iters=5):
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(*args))
    float(jnp.sum(jfn(*args))) if False else None

    def chain(*a):
        def step(c, _):
            return jnp.sum(jfn(a[0] + c.astype(a[0].dtype), *a[1:])).astype(jnp.float32), None

        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=SCAN_LEN)
        return c

    cj = jax.jit(chain)
    float(cj(*args))
    float(cj(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(cj(*args))
    return (time.perf_counter() - t0) / (iters * SCAN_LEN) * 1e3


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def pack_weights(w):
    """(3,3,3,Co) -> (2,2,48,4*Co) for the packed conv."""
    Co = w.shape[-1]
    wp = np.zeros((2, 2, 4, 4, 3, 2, 2, Co), np.float32)  # (Ka,Kb,dy,dx,c, oy,ox, Co)
    # output pixel (2a+oy, 2b+ox) reads x[4a+2*oy+ky-1, 4b+2*ox+kx-1]
    # = packed cell (a + (2*oy+ky-1)//4?? ) -- derive: row r = 4a + t where
    # t = 2*oy+ky-1 in [-1..3]; packed cell index a + floor(t/4) with
    # dy = t mod 4. floor(-1/4) = -1 -> cell a-1, dy=3. Our packed conv uses
    # kernel index Ka in {0,1} over cells {a-1, a} (padding 1 cell at top).
    for oy in range(2):
        for ox in range(2):
            for ky in range(3):
                for kx in range(3):
                    t = 2 * oy + ky - 1
                    u = 2 * ox + kx - 1
                    ca, dy = divmod(t, 4)
                    cb, dx = divmod(u, 4)
                    # ca in {-1, 0}; kernel tap Ka = ca + 1
                    wp[ca + 1, cb + 1, dy, dx, :, oy, ox, :] = w[ky, kx, :, :]
    return jnp.asarray(wp.reshape(2, 2, 48, 4 * Co), DT)


def conv_packed(x, wp):
    B, H, W, C = x.shape
    P = x.reshape(B, H // 4, 4, W // 4, 4, C).transpose(0, 1, 3, 2, 4, 5).reshape(
        B, H // 4, W // 4, 48
    )
    y = jax.lax.conv_general_dilated(
        P, wp, (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # (B, H/4, W/4, 4*Co)
    Co = y.shape[-1] // 4
    y = y.reshape(B, H // 4, W // 4, 2, 2, Co).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H // 2, W // 2, Co)


def main():
    rng = np.random.RandomState(0)
    B, H, W = 6, 320, 800
    x = jnp.asarray(rng.randn(B, H, W, 3), DT)
    w = rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1
    wj = jnp.asarray(w, DT)
    wp = pack_weights(w)

    ref = conv_ref(x, wj)
    packed = conv_packed(x, wp)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - packed.astype(jnp.float32))))
    print("max abs diff:", err, flush=True)

    t_ref = timed(lambda x: conv_ref(x, wj), x)
    t_packed = timed(lambda x: conv_packed(x, wp), x)
    print(f"stem1 naive : {t_ref:7.3f} ms")
    print(f"stem1 packed: {t_packed:7.3f} ms")


if __name__ == "__main__":
    main()


def bench_convs():
    rng = np.random.RandomState(0)
    B = 6

    def conv(x, w, s):
        return jax.lax.conv_general_dilated(
            x, w, (s, s), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    cases = [
        ("stem1 3->64 /2 @320x800", (B, 320, 800, 3), (3, 3, 3, 64), 2),
        ("stem2 64->64 @160x400", (B, 160, 400, 64), (3, 3, 64, 64), 1),
        ("stem3 64->128 /2 @160x400", (B, 160, 400, 64), (3, 3, 64, 128), 2),
        ("s3 conv 160->160 @40x100", (B, 40, 100, 160), (3, 3, 160, 160), 1),
        ("s4 conv 192->192 @20x50", (B, 20, 50, 192), (3, 3, 192, 192), 1),
        ("s3 concat 1056->512 @40x100", (B, 40, 100, 1056), (1, 1, 1056, 512), 1),
        ("s4 concat 1472->768 @20x50", (B, 20, 50, 1472), (1, 1, 1472, 768), 1),
    ]
    for name, xs, ws, s in cases:
        x = jnp.asarray(rng.randn(*xs), DT)
        w = jnp.asarray(rng.randn(*ws) * 0.05, DT)
        ms = timed(lambda x, w=w, s=s: conv(x, w, s), x)
        gflop = 2 * np.prod(ws) * (xs[1] // s) * (xs[2] // s) * B / 1e9
        print(f"{name:30s}: {ms:7.3f} ms  {gflop:7.1f} GF  {gflop/ms:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    bench_convs()
