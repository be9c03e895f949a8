"""Tracing / profiling utilities — the TPU-native replacement for the
reference's CUDA-event timing (train_4DGS.py:70-71,147,230) and ad-hoc
get_time() probes (SURVEY.md §5): jax.profiler traces plus
block-until-ready wall timers."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class IterTimer:
    """EMA iteration timer with device synchronization on sample points."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg_ms = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = (time.perf_counter() - self._t0) * 1000.0
        self.avg_ms = dt if self.avg_ms is None else (
            self.ema * self.avg_ms + (1 - self.ema) * dt)
        return dt


def timed(fn, *args, n: int = 10, warmup: int = 1):
    """Benchmark a jitted callable: returns (ms_per_call, last_output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0, out
