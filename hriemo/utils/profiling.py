"""Tracing / profiling utilities (SURVEY.md §5.1 — absent in the reference,
first-class here: per-step timing is what proves the utterances/sec/chip
north star).

``StepTimer`` measures steady-state step walltimes (discarding warmup) and
reports p50/p95/mean; ``trace`` wraps ``jax.profiler.trace`` so a training
run can emit a TensorBoard-viewable device trace with one flag.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._t0 = None
        self._n = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self._times.append(dt)
        return dt

    @contextlib.contextmanager
    def measure(self):
        self.start()
        yield
        self.stop()

    def summary(self) -> dict:
        if not self._times:
            return {"steps": 0}
        a = np.asarray(self._times)
        return {
            "steps": int(a.size),
            "p50_ms": float(np.percentile(a, 50) * 1000),
            "p95_ms": float(np.percentile(a, 95) * 1000),
            "mean_ms": float(a.mean() * 1000),
            "steps_per_sec": float(1.0 / a.mean()),
        }


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler device trace when a log dir is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
    print(f"[profiler] trace written to {log_dir}")
