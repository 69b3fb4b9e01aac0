"""Tracing / profiling / structured logging (SURVEY.md §5).

The reference's observability is wall-clock AverageMeters printed every 100
batches (geo-aware/train.py:247-249,300-314).  The TPU-native equivalents:

  * ``trace(logdir)`` — a context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable device trace (enable in training with
    ``ICEK_PROFILE_DIR=/path``);
  * ``StepTimer`` — batch-time / data-time split kept from the reference,
    plus device-sync-aware step timing;
  * ``MetricLogger`` — line-JSON structured logs next to the human-readable
    prints, for machine consumption.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """Capture a jax.profiler trace if a log directory is given."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Tracks data-load time vs step (compute) time per iteration."""

    def __init__(self):
        self.data_s = 0.0
        self.step_s = 0.0
        self.steps = 0
        self._mark = time.perf_counter()

    def data_ready(self):
        now = time.perf_counter()
        self.data_s += now - self._mark
        self._mark = now

    def step_done(self):
        now = time.perf_counter()
        self.step_s += now - self._mark
        self._mark = now
        self.steps += 1

    def summary(self) -> Dict[str, float]:
        n = max(self.steps, 1)
        return {
            "steps": self.steps,
            "avg_data_ms": 1000.0 * self.data_s / n,
            "avg_step_ms": 1000.0 * self.step_s / n,
        }


class MetricLogger:
    """Append-only line-JSON metrics log (one object per event)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, event: str, **fields):
        if not self.path:
            return
        record = {"ts": time.time(), "event": event, **fields}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


def profile_dir_from_env() -> Optional[str]:
    return os.environ.get("ICEK_PROFILE_DIR") or None
