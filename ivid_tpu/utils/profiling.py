"""Profiling / tracing hooks — the aux subsystem the reference lacks
(SURVEY.md §5.1: only wall-clock step timing exists upstream,
reference: diffusion/trainers/basic.py:397-402).

``trace(dir)`` wraps a region in a ``jax.profiler`` trace viewable in
TensorBoard/XProf; ``StepTimer`` collects step-time statistics with jitter
percentiles for throughput reports."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Profile the enclosed region with jax.profiler when ``log_dir`` is set."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window: int = 500):
        self.window = window
        self.times: list = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self):
        assert self._t0 is not None
        self.times.append(time.time() - self._t0)
        if len(self.times) > self.window:
            self.times = self.times[-self.window :]
        self._t0 = None

    def stats(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "max_s": float(arr.max()),
        }
