"""Tracing / profiling / observability.

The reference's only observability is tqdm text (SURVEY.md section 5). Here:
  * ``trace(logdir)``       — context manager around jax.profiler for device
                              traces viewable in TensorBoard/Perfetto
  * ``PhaseTimer``          — compile-vs-step wall-time accounting
  * ``ThroughputMeter``     — iters/sec and MC-samples/sec counters (the
                              BASELINE.json north-star metrics)
  * ``JsonlLogger``         — append-only JSONL metric stream per run
  * ``debug_nans(enable)``  — toggle jax NaN debugging globally
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def debug_nans(enable: bool = True):
    import jax
    jax.config.update("jax_debug_nans", enable)


class PhaseTimer:
    """Accumulates wall time per named phase; distinguishes compile from
    steady-state execution when used around first/later dispatches."""

    def __init__(self):
        self.totals: dict = {}
        self.counts: dict = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {name: {"total_s": round(self.totals[name], 4),
                       "count": self.counts[name],
                       "mean_s": round(self.totals[name]
                                       / max(self.counts[name], 1), 6)}
                for name in self.totals}


class ThroughputMeter:
    def __init__(self):
        self._t0: Optional[float] = None
        self._units = 0.0

    def start(self):
        self._t0 = time.perf_counter()
        self._units = 0.0

    def add(self, units: float):
        self._units += units

    @property
    def per_sec(self) -> float:
        if self._t0 is None:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self._units / dt if dt > 0 else 0.0


class JsonlLogger:
    """Append-only JSONL metrics stream (one object per event)."""

    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "a", buffering=1)

    def log(self, **fields):
        fields.setdefault("t", time.time())
        self._fh.write(json.dumps(fields) + "\n")

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
