"""Head/decoder roofline at flagship batch-1 shapes (ROOFLINE.md §5).

The backbone roofline (tools/roofline_vov.py) proved batch-1 conv MFU is
shape-intrinsic; this tool does the same falsifiable exercise for the other
5.7 ms of the flagship's 19.8 ms: PETRHead at (B=1, N=6, feat 20x50,
C=256, Q=900, L_tok=6000, 6 layers).

Protocol identical to roofline_vov.py: GROUP distinct ops chained inside a
SCAN_LEN scan, carry-perturbed inputs passed as arguments, one host value
read per run. Three measurement families:

  1. in-graph: full PETRHeadNet, decoder-only (PETRTransformer), 3D-PE
     geometry (position_coords_3d + encoders) — where the 5.7 ms live.
  2. same-shape GEMM anchors for every dominant dense/attention contraction
     in the head — what the MXU gives those exact shapes in isolation.
  3. the Pallas flash cross-attention kernel at (900 q, 6000 kv) vs its
     two constituent GEMM anchors — kernel overhead vs unfused dots.

Output: per-component (GF, anchor TF/s, attainable ms) table + the summed
attainable vs measured head time. The gap is the falsifiable claim.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline_head.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

DT = jnp.bfloat16
SCAN_LEN = 20
GROUP = 4
PEAK_TFLOPS = 197.0


def _chain_time(op, arglists, iters=4):
    """Seconds per single op instance; op(*args) -> scalar f32."""

    def chain(c0, arglists):
        def step(c, _):
            s = jnp.float32(0)
            for args in arglists:
                perturbed = [args[0] + c.astype(args[0].dtype), *args[1:]]
                s = s + op(*perturbed).astype(jnp.float32)
            return s * 1e-20, None

        c, _ = jax.lax.scan(step, c0, None, length=SCAN_LEN)
        return c

    cj = jax.jit(chain)
    float(cj(jnp.float32(0), arglists))
    float(cj(jnp.float32(0), arglists))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(cj(jnp.float32(0), arglists))
    return (time.perf_counter() - t0) / (iters * SCAN_LEN * len(arglists))


def time_gemm(M, K, N, dtype=DT):
    rng = np.random.RandomState(0)
    args = [
        (jnp.asarray(rng.randn(M, K) * 0.05, dtype),
         jnp.asarray(rng.randn(K, N) * 0.05, dtype))
        for _ in range(GROUP)
    ]
    sec = _chain_time(
        lambda x, w: jnp.sum(jnp.dot(x, w, preferred_element_type=jnp.float32)),
        args,
    )
    return sec, 2 * M * K * N / sec / 1e12


def time_attn_einsums(B, H, Q, L, D):
    """The two attention contractions as XLA batched GEMMs (bhqd x bhld)."""
    rng = np.random.RandomState(0)
    q = [jnp.asarray(rng.randn(B, H, Q, D) * 0.05, DT) for _ in range(GROUP)]
    k = [jnp.asarray(rng.randn(B, H, L, D) * 0.05, DT) for _ in range(GROUP)]
    v = [jnp.asarray(rng.randn(B, H, L, D) * 0.05, DT) for _ in range(GROUP)]
    qk = _chain_time(
        lambda a, b: jnp.sum(
            jnp.einsum("bhqd,bhld->bhql", a, b,
                       preferred_element_type=jnp.float32)),
        list(zip(q, k)),
    )
    # softmax-shaped operand for PV so dtypes match the real graph
    p = [jnp.asarray(np.abs(rng.randn(B, H, Q, L)) * 0.01, DT) for _ in range(GROUP)]
    pv = _chain_time(
        lambda a, b: jnp.sum(
            jnp.einsum("bhql,bhld->bhqd", a, b,
                       preferred_element_type=jnp.float32)),
        list(zip(p, v)),
    )
    fl = 2 * B * H * Q * L * D
    return (qk, fl / qk / 1e12), (pv, fl / pv / 1e12)


def time_flash(B, H, Q, L, D, block_q=128, block_k=512):
    from petr_tpu.ops.pallas.cross_attention import flash_cross_attention

    rng = np.random.RandomState(0)
    args = [
        tuple(jnp.asarray(rng.randn(B, H, n, D) * 0.05, DT) for n in (Q, L, L))
        for _ in range(GROUP)
    ]
    sec = _chain_time(
        lambda q, k, v: jnp.sum(
            flash_cross_attention(q, k, v, None, block_q, block_k).astype(jnp.float32)
        ),
        args,
    )
    return sec, 4 * B * H * Q * L * D / sec / 1e12  # 2 contractions


def main():
    import __graft_entry__ as ge
    from petr_tpu.configs import get_config
    from petr_tpu.models.detector import PETRFeatureNet, PETRHeadNet

    cfg = get_config(sys.argv[1] if len(sys.argv) > 1 else "petr_vov_p4_800x320")
    mc = cfg.model
    hc = mc.head
    B, N = 1, cfg.data.num_views
    H, W = cfg.data.image_size
    fh, fw = H // 16, W // 16
    C = hc.embed_dim
    Q = hc.num_query
    Ltok = N * fh * fw
    nL = hc.num_layers
    heads = hc.num_heads
    D = C // heads
    print(f"flagship head shapes: B={B} N={N} feat={fh}x{fw} L_tok={Ltok} "
          f"C={C} Q={Q} layers={nL} heads={heads}", flush=True)

    # ------------------------------------------------ 1. in-graph timings
    batch = ge._batch(B, N, H, W, 8)
    feat_c = 256  # CPFPN output channels
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(B, N, fh, fw, feat_c) * 0.1, DT)
    img2lidar = jnp.asarray(batch["img2lidar"])
    img_hw = jnp.asarray(batch["img_hw"])

    head = PETRHeadNet(mc, (H, W))
    hvars = head.init(jax.random.PRNGKey(0), feats, img2lidar, img_hw)

    def head_op(f, params):
        out = head.apply({"params": params}, f, img2lidar, img_hw)
        return sum(jnp.sum(v.astype(jnp.float32)) * 1e-9 for v in out.values())

    sec = _chain_time(head_op, [(feats, hvars["params"])], iters=3)
    print(f"in-graph FULL HEAD: {sec*1e3:.3f} ms", flush=True)
    head_ms = sec * 1e3

    # 3D-PE geometry alone (fp32 islands: frustum coords + PE MLPs)
    from petr_tpu.ops.geometry import inverse_sigmoid, position_coords_3d

    def pe_op(i2l):
        coords3d, _ = position_coords_3d(
            fh, fw, float(H), float(W), i2l, tuple(hc.position_range),
            depth_num=hc.depth_num, depth_start=hc.depth_start,
            depth_mode=hc.depth_mode,
        )
        return jnp.sum(inverse_sigmoid(coords3d)) * 1e-9

    sec = _chain_time(pe_op, [(img2lidar,)], iters=3)
    print(f"in-graph 3D-PE geometry (fp32): {sec*1e3:.3f} ms", flush=True)

    # ------------------------------------------------ 2. GEMM anchors
    PE_IN = 3 * hc.depth_num
    gemms = [
        # (label, M, K, N, per-layer count, layer-multiplier)
        ("input_proj", Ltok, feat_c, C, 1, 1),
        ("pe.fc1", Ltok, PE_IN, 4 * C, 1, 1),
        ("pe.fc2 / adapt.fc2", Ltok, 4 * C, C, 2, 1),
        ("adapt.fc1", Ltok, C, 4 * C, 1, 1),
        ("kv_proj", Ltok, C, C, 2, nL),
        ("q/out_proj(self+cross)+qkv_self", Q, C, C, 7, nL),
        ("ffn.fc1", Q, C, hc.ffn_dim, 1, nL),
        ("ffn.fc2", Q, hc.ffn_dim, C, 1, nL),
        ("branches(stacked)", nL * Q, C, C, 4, 1),
    ]
    total_gf = 0.0
    attainable_ms = 0.0
    print(f"\n{'component':34s} {'GF':>7s} {'TF/s':>6s} {'ms-att':>7s}")
    for label, M, K, Nn, cnt, mult in gemms:
        sec, tf = time_gemm(M, K, Nn)
        gf = 2 * M * K * Nn * cnt * mult / 1e9
        ms = gf / tf / 1e3 if tf else float("inf")
        total_gf += gf
        attainable_ms += ms
        print(f"{label:34s} {gf:7.2f} {tf:6.1f} {ms:7.3f}", flush=True)

    (qks, qkt), (pvs, pvt) = time_attn_einsums(B, heads, Q, Ltok, D)
    gf_x = 2 * B * heads * Q * Ltok * D * 2 * nL / 1e9
    ms_x = nL * (qks + pvs) * 1e3
    print(f"{'cross-attn einsums (XLA)':34s} {gf_x:7.2f} "
          f"{gf_x/ms_x/1e0/1e3*1e3:6.1f} {ms_x:7.3f}", flush=True)
    (qks_s, _), (pvs_s, _) = time_attn_einsums(B, heads, Q, Q, D)
    gf_s = 2 * B * heads * Q * Q * D * 2 * nL / 1e9
    ms_s = nL * (qks_s + pvs_s) * 1e3
    print(f"{'self-attn einsums (XLA)':34s} {gf_s:7.2f} "
          f"{gf_s/ms_s/1e3:6.1f} {ms_s:7.3f}", flush=True)
    total_gf += gf_x + gf_s
    attainable_ms += ms_x + ms_s

    fsec, ftf = time_flash(B, heads, Q, Ltok, D)
    print(f"{'flash kernel (Q=900,L=6000)':34s} {4*B*heads*Q*Ltok*D/1e9:7.2f} "
          f"{ftf:6.1f} {fsec*1e3:7.3f}  (per layer, x{nL} = {nL*fsec*1e3:.3f} ms)",
          flush=True)

    print(f"\nTOTAL dense GF: {total_gf:.1f}; attainable (sum of anchors): "
          f"{attainable_ms:.3f} ms; measured full head: {head_ms:.3f} ms; "
          f"gap: {head_ms - attainable_ms:.3f} ms "
          f"({100*(head_ms-attainable_ms)/head_ms:.0f}% of head time)",
          flush=True)
    print(f"head effective rate: {total_gf/head_ms:.1f} TF/s "
          f"({100*total_gf/head_ms/(PEAK_TFLOPS):.1f}% of 197 paper peak)",
          flush=True)


if __name__ == "__main__":
    main()
