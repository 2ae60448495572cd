"""Structured metrics, timers, and profiling hooks.

The reference's only observability is print + tqdm (SURVEY 5.1/5.5). This
framework provides:

- a process-wide metrics registry (counters / gauges / timing histograms with
  p50/p95) that the engine feeds per-window and per-stage,
- ``stage()`` context manager that both times a host-side stage and opens a
  ``jax.profiler.TraceAnnotation`` so device traces line up with host stages,
- one-line JSON snapshots for benches and services.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, List

import jax


class Metrics:
    def __init__(self):
        self.counters: Dict[str, float] = defaultdict(float)
        self.gauges: Dict[str, float] = {}
        self.timings: Dict[str, List[float]] = defaultdict(list)

    def count(self, name: str, value: float = 1.0) -> None:
        self.counters[name] += value

    def gauge(self, name: str, value: float) -> None:
        self.gauges[name] = float(value)

    def record_time(self, name: str, seconds: float) -> None:
        self.timings[name].append(seconds)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        """Time a stage and annotate the device trace with the same name."""
        start = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        self.record_time(name, time.perf_counter() - start)

    @staticmethod
    def _pct(values: List[float], q: float) -> float:
        if not values:
            return 0.0
        s = sorted(values)
        idx = min(int(q * len(s)), len(s) - 1)
        return s[idx]

    def snapshot(self) -> dict:
        out: dict = {"counters": dict(self.counters), "gauges": dict(self.gauges)}
        for name, values in self.timings.items():
            out[f"{name}_p50_ms"] = round(self._pct(values, 0.50) * 1000, 2)
            out[f"{name}_p95_ms"] = round(self._pct(values, 0.95) * 1000, 2)
            out[f"{name}_count"] = len(values)
        return out

    def dump_json(self) -> str:
        return json.dumps(self.snapshot(), sort_keys=True)

    def reset(self) -> None:
        self.counters.clear()
        self.gauges.clear()
        self.timings.clear()


GLOBAL_METRICS = Metrics()


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a full device profile (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
