"""MFU (model FLOPs utilization) reporting helpers.

Turns "fast" into a falsifiable number: benchmarks report achieved TFLOP/s
(XLA cost-analysis FLOPs / measured wall time) and the fraction of the
chip's peak matmul rate. Protocol anchor: the reference's
`tools/analysis_tools/benchmark.py:64-91` reports only fps; this is the
TPU-native extension (scaling-book MFU convention).
"""

from __future__ import annotations

from typing import Optional

# Peak dense-matmul TFLOP/s by TPU generation (bf16 unless noted).
# Public figures: v4 275, v5e 197 (394 int8), v5p 459, v6e 918.
_PEAK_TFLOPS = (
    ("v6e", 918.0),
    ("v6", 918.0),
    ("v5p", 459.0),
    ("v5 lite", 197.0),
    ("v5litepod", 197.0),
    ("v5e", 197.0),
    ("v4", 275.0),
)


def device_peak_tflops() -> Optional[float]:
    """Peak bf16 TFLOP/s of jax.devices()[0], or None (unknown/CPU)."""
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for key, peak in _PEAK_TFLOPS:
        if key in kind:
            return peak
    return None


def compiled_flops(compiled) -> Optional[float]:
    """Total FLOPs of a jax Compiled object per execution, or None.

    CAVEAT: XLA's cost analysis counts a `lax.scan`/while-loop BODY once,
    not times the trip count — for an executable that chains iterations in
    a scan (the RTT-amortized bench protocol), use `lowered_flops` on the
    single-iteration function instead and divide by the true batch only.
    """
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        f = ca.get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


def lowered_flops(fn, *args) -> Optional[float]:
    """FLOPs of one call of ``fn(*args)`` from the unoptimized lowering —
    no backend compile needed; matmul/conv FLOPs are fusion-invariant.
    This is the CANONICAL flop basis for MFU (`bench.py`, `bench_train`).

    The axon (remote TPU) backend returns None from a Lowered's
    cost_analysis; the in-process CPU backend's lowering of the same
    function gives the identical platform-independent count, so fall back
    to lowering against CPU (lowering only needs avals — nothing runs).

    LIMITATION: returns None (silently) for functions containing Pallas
    kernels when called from an axon process — Pallas refuses CPU lowering
    there, and XLA cost analysis would not count a pallas_call's interior
    flops anyway. Callers must count a flash-free equivalent of the model
    (`use_flash_attention=False` — parity-tested identical math)."""
    import jax

    def _try(lower_ctx):
        try:
            with lower_ctx():
                ca = jax.jit(fn).lower(*args).cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            f = ca.get("flops")
            return float(f) if f and f > 0 else None
        except Exception:
            return None

    import contextlib

    out = _try(contextlib.nullcontext)
    if out is not None:
        return out
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        return None
    return _try(lambda: jax.default_device(cpu))


def mfu_fields(flops_per_item: Optional[float], items_per_s: float) -> dict:
    """JSON-ready {model_gflops, achieved_tflops, mfu_pct} (empty if unknown)."""
    if not flops_per_item:
        return {}
    achieved = flops_per_item * items_per_s / 1e12
    out = {
        "model_gflops": round(flops_per_item / 1e9, 1),
        "achieved_tflops": round(achieved, 2),
    }
    peak = device_peak_tflops()
    if peak:
        out["mfu_pct"] = round(100.0 * achieved / peak, 1)
    return out
