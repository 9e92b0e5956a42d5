"""Observability: per-block timing, deadline tracking, profiler hooks.

The reference's only telemetry is an xrun counter that is incremented but
never read (engine.py:157-158, SURVEY.md §5 "tracing/profiling: NOT
PRESENT").  This module gives the framework real operational metrics:

- ``BlockTimer``: lock-free-ish rolling window of per-block wall times with
  p50/p99, realtime-factor, and a deadline-miss (xrun) counter measured
  against the audio deadline (blocksize / fs).
- ``trace()``: context manager around ``jax.profiler`` for on-demand
  device traces.

The serving layer exposes a snapshot via the ``get_stats`` WebSocket
command (an additive protocol extension; every reference command is
unchanged).
"""

from __future__ import annotations

import contextlib
import threading
import time

import numpy as np


class BlockTimer:
    """Rolling window of per-block processing times."""

    def __init__(self, fs: int, blocksize: int, window: int = 2048):
        self.fs = fs
        self.blocksize = blocksize
        self.deadline_s = blocksize / float(fs)
        self._times = np.zeros(window, np.float64)
        self._n = 0
        self._idx = 0
        self._xruns = 0
        self._total_blocks = 0
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def block(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            # A block that RAISES still consumed wall time — usually the
            # worst blocks (device errors, retries); skipping them would
            # understate exactly the p99/xruns this timer exists to show.
            self.record(time.perf_counter() - t0)

    def record(self, seconds: float):
        with self._lock:
            self._times[self._idx] = seconds
            self._idx = (self._idx + 1) % len(self._times)
            self._n = min(self._n + 1, len(self._times))
            self._total_blocks += 1
            if seconds > self.deadline_s:
                self._xruns += 1

    def snapshot(self) -> dict:
        with self._lock:
            n = self._n
            times = self._times[:n].copy()
            xruns = self._xruns
            total = self._total_blocks
        if n == 0:
            return {"blocks": 0, "xruns": xruns}
        p50, p99 = np.percentile(times, [50, 99])
        return {
            "blocks": int(total),
            "xruns": int(xruns),
            "deadline_ms": round(self.deadline_s * 1000, 3),
            "p50_ms": round(float(p50) * 1000, 3),
            "p99_ms": round(float(p99) * 1000, 3),
            "max_ms": round(float(times.max()) * 1000, 3),
            "realtime_factor": round(self.deadline_s / max(float(np.mean(times)), 1e-9), 1),
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/aefs_trace"):
    """Capture a jax.profiler device trace around a region of interest."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
