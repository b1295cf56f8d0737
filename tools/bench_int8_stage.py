"""Full-stage int8 vs bf16: VoVNet stage4 (9 OSA blocks) with a realistic
PTQ dataflow — activations requantized to int8 between convs, per-channel
weight scales folded into the rescale, eSE gate in bf16.

Measured (v5e): bf16 6.42 ms vs int8 5.34 ms -> 1.20x. The VPU requant
traffic between convs eats most of the MXU's 2x int8 peak at these shapes;
see also bench_int8_conv.py (isolated convs: ~1.0-1.4x, best on big 1x1s).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import flax.linen as nn

from petr_tpu.models.vovnet import SPECS, OSABlock, hsigmoid

SCAN_LEN = 30


def timed(fn, params, x, iters=4):
    jfn = jax.jit(fn)

    def chain(p, x):
        def step(c, _):
            if jnp.issubdtype(x.dtype, jnp.integer):
                xx = jnp.bitwise_xor(x, c.astype(jnp.int32).astype(x.dtype))
            else:
                xx = x + c.astype(x.dtype) * 1e-12
            return jnp.sum(jfn(p, xx).astype(jnp.float32)).astype(jnp.float32), None

        c, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None, length=SCAN_LEN)
        return c

    cj = jax.jit(chain)
    float(cj(params, x))
    float(cj(params, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(cj(params, x))
    return (time.perf_counter() - t0) / (iters * SCAN_LEN) * 1e3


def qconv(x_i8, w_i8, scale, bias, stride=1):
    """int8 conv -> int32 -> per-channel rescale + bias -> relu -> bf16."""
    y = jax.lax.conv_general_dilated(
        x_i8, w_i8, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.bfloat16) * scale + bias
    return jnp.maximum(y, 0)


def quant(x_bf16, inv_scale):
    return jnp.clip(jnp.round(x_bf16.astype(jnp.float32) * inv_scale), -127, 127).astype(jnp.int8)


def int8_osa_block(x_i8, ws, identity, x_res):
    feats = [x_i8]
    y = x_i8
    for w, s, b in ws["convs"]:
        y_b = qconv(y, w, s, b)
        y = quant(y_b, ws["act_inv"])
        feats.append(y)
    cat = jnp.concatenate(feats, axis=-1)
    w, s, b = ws["concat"]
    y = qconv(cat, w, s, b)
    # eSE in bf16
    g = y.mean(axis=(-3, -2), keepdims=True)
    g = jnp.einsum("bhwc,cd->bhwd", g, ws["ese_w"]) + ws["ese_b"]
    y = y * hsigmoid(g)
    if identity:
        y = y + x_res
    return y


def main():
    spec = SPECS["V-99-eSE"]
    stage = 2  # stage4: 192ch convs, 768 out, 9 blocks @ 20x50
    B, H, W = 6, 20, 50
    Cin = 512
    sc, oc, lpb, nb = spec["stage_conv_ch"][stage], spec["stage_out_ch"][stage], spec["layer_per_block"], spec["block_per_stage"][stage]
    rng = np.random.RandomState(0)

    # bf16 reference: reuse model OSABlock
    class S(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
            for b in range(nb):
                x = OSABlock(sc, oc, lpb, b > 0, True, jnp.bfloat16, name=f"blk{b}")(x)
            return x

    xb = jnp.asarray(rng.randn(B, H * 2, W * 2, Cin), jnp.bfloat16)
    m = S()
    p = m.init(jax.random.PRNGKey(0), xb)["params"]
    t_bf16 = timed(lambda p, x: m.apply({"params": p}, x), p, xb)

    # int8 stage
    blocks = []
    cin = Cin
    for b in range(nb):
        convs = []
        c = cin
        for i in range(lpb):
            convs.append((
                jnp.asarray(rng.randint(-127, 128, (3, 3, c, sc)), jnp.int8),
                jnp.asarray(rng.rand(sc) * 1e-3, jnp.bfloat16),
                jnp.asarray(rng.randn(sc) * 0.1, jnp.bfloat16),
            ))
            c = sc
        cat_c = cin + lpb * sc
        blocks.append({
            "convs": convs,
            "concat": (
                jnp.asarray(rng.randint(-127, 128, (1, 1, cat_c, oc)), jnp.int8),
                jnp.asarray(rng.rand(oc) * 1e-3, jnp.bfloat16),
                jnp.asarray(rng.randn(oc) * 0.1, jnp.bfloat16),
            ),
            "ese_w": jnp.asarray(rng.randn(oc, oc) * 0.02, jnp.bfloat16),
            "ese_b": jnp.asarray(rng.randn(oc) * 0.1, jnp.bfloat16),
            "act_inv": jnp.bfloat16(16.0),
        })
        cin = oc

    def int8_stage(ws, x_i8):
        y = x_i8
        y_bf = None
        for b, w in enumerate(ws):
            y_b = int8_osa_block(y, w, b > 0, y_bf)
            y_bf = y_b
            y = quant(y_b, w["act_inv"])
        return y_bf

    xi = jnp.asarray(rng.randint(-127, 128, (B, H, W, Cin)), jnp.int8)
    t_int8 = timed(int8_stage, blocks, xi)

    print(f"stage4 bf16 (incl maxpool): {t_bf16:6.3f} ms")
    print(f"stage4 int8 dataflow      : {t_int8:6.3f} ms   speedup {t_bf16/t_int8:4.2f}x")


if __name__ == "__main__":
    main()
