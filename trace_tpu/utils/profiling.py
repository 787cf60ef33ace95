"""Profiling and run telemetry.

The reference has no profiler hooks or timing beyond an eval wall-clock print
(SURVEY.md §5); its only telemetry is W&B.  Here:

* :func:`trace` wraps jax.profiler for on-demand XLA traces (view in
  TensorBoard / xprof);
* :class:`StepTimer` measures device-synchronized wall times;
* :class:`MetricsLogger` appends JSONL run telemetry (the zero-egress W&B
  replacement), used by the training loop.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/trace_tpu_profile"):
    """Capture an XLA profiler trace around the enclosed block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Device-synchronized section timing: timer('name') context manager."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, sync: Optional[jax.Array] = None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / self.counts[name], 4),
            }
            for name in self.totals
        }


class MetricsLogger:
    """Append-only JSONL metrics stream (W&B replacement, zero egress)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a")
        self._t0 = time.time()

    def log(self, step: int, metrics: dict) -> None:
        rec = {"step": step, "wall_s": round(time.time() - self._t0, 2)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()
