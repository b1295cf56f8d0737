"""Profiling / step-timing instrumentation.

Reference had only a synchronized FPS loop (`benchmark.py:64-91`) and runner
iter-time logs. Here: jax.profiler trace capture plus a step timer that
forces a host value read (the remote-execution relay resolves
block_until_ready before true completion — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA/TPU profile viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_completion(tree) -> float:
    """Return a host scalar that depends on every leaf (true sync point)."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    acc = 0.0
    for x in leaves:
        if jnp.issubdtype(x.dtype, jnp.floating):
            acc = acc + x.sum().astype(jnp.float32)
    return float(acc) if not isinstance(acc, float) else 0.0


class StepTimer:
    """Rolling iteration-time stats with true-completion timing."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: List[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, outputs=None) -> float:
        if outputs is not None:
            force_completion(outputs)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        return {
            "mean_s": sum(ts) / len(ts),
            "p50_s": ts[len(ts) // 2],
            "max_s": ts[-1],
        }
