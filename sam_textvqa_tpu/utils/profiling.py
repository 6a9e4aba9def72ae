"""Profiling / tracing hooks.

The reference has no tracing at all (SURVEY.md §5 — only tqdm bars). Here:
* :func:`trace` — context manager around `jax.profiler` emitting a
  TensorBoard-loadable trace directory;
* :class:`StepTimer` — lightweight samples/sec + step-latency meter with
  percentile summaries (device-sync aware).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a device trace: ``with trace("/tmp/trace"): step(...)``."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self, skip_warmup: int = 1) -> Dict[str, float]:
        t = np.asarray(self.times[skip_warmup:] or self.times)
        return {
            "steps": int(t.size),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p95_ms": float(np.percentile(t, 95) * 1e3),
            "samples_per_sec": float(self.batch_size / t.mean()),
        }
