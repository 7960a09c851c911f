"""Profiling / tracing subsystem (TPU-native).

The reference ships no tracing (SURVEY §5: only dead calflops/ptflops
probes). The rebuild makes profiling first-class:

- ``trace(logdir)``: context manager around ``jax.profiler`` that captures an
  XLA device trace viewable in TensorBoard / Perfetto.
- ``StepTimer``: wall-clock per-step timing with warmup skip and percentile
  summaries; drives the imgs/sec numbers logged by the Trainer and
  ``bench.py``.
- ``annotate``: named TraceAnnotation spans that show up inside device
  traces (cheap; no-op outside an active trace).

Enable from the CLI via ``--trainer.profiler <logdir>`` (config.py) or
programmatically.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a device trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step wall-clock stats with compile-step exclusion."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._skipped = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        if self._skipped < self.warmup:
            self._skipped += 1
        else:
            self.times.append(dt)
        return False

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "min_s": ts[0],
            "p50_s": ts[n // 2],
            "p90_s": ts[min(n - 1, int(n * 0.9))],
            "max_s": ts[-1],
        }
