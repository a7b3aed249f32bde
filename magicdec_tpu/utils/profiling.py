"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference times phases with torch.cuda.synchronize() + time.time()
buckets (tests/SnapKV/selfspec_benchmark.py:153-171) and has no profiler
integration; here the same three-bucket wall-clock report plus native
jax.profiler traces (viewable in XProf/TensorBoard or Perfetto).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace of everything inside the context."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseClock:
    """Synchronized wall-clock buckets (draft/verify/loop in the reference)."""

    def __init__(self):
        self.buckets: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.buckets[name] = (self.buckets.get(name, 0.0)
                              + time.perf_counter() - t0)
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict:
        return {k: {"total_s": round(v, 4),
                    "avg_ms": round(v / self.counts[k] * 1e3, 3)}
                for k, v in self.buckets.items()}


def step_cost_report(fn, *args, iters: int = 10, label: str = "step"):
    """Time a jitted step with a true device sync per batch of iters."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {label: {"ms": round(dt * 1e3, 3)}}
