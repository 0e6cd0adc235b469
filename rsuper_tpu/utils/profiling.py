"""Profiling / tracing.

The reference has no formal profiling (SURVEY.md §5: ad-hoc time.time deltas
only). Here: `jax.profiler` trace capture for a window of steps (viewable in
TensorBoard / Perfetto / xprof), plus a lightweight step-phase timer that
separates host-input, device-augment and train-step time — the three places
a 3D pipeline stalls.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict

import jax


class TraceCapture:
    """Capture a jax.profiler trace for steps [start, start+num)."""

    def __init__(self, log_dir: str, start_step: int = 10, num_steps: int = 5):
        self.log_dir = log_dir
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def step(self, step: int):
        if step == self.start and not self._active:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class PhaseTimer:
    """Accumulates wall time per named phase across an epoch."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            f"{k}_ms": 1000.0 * v / max(self.counts[k], 1)
            for k, v in self.totals.items()
        }
