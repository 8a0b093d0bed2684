"""Tracing / profiling utilities.

The reference measures wall-clock only (`timeit.default_timer` around the
prediction and solve calls, main_base.py:273-318; the Rust solver
self-reports `solve_time_ms`).  This module keeps that per-step solve-time
metric as the headline number and adds device-level tracing via
`jax.profiler` (SURVEY.md §5).
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List


@dataclass
class StepTimer:
    """Accumulates per-phase wall-clock times across control steps."""
    times: Dict[str, List[float]] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self, discard_first: int = 10) -> Dict[str, dict]:
        out = {}
        for name, vals in self.times.items():
            arr = vals[discard_first:] if len(vals) > discard_first else vals
            if not arr:
                continue
            s = sorted(arr)
            out[name] = {
                "mean_s": sum(arr) / len(arr),
                "max_s": max(arr),
                "p95_s": s[min(len(s) - 1, int(0.95 * len(s)))],
                "count": len(vals),
            }
        return out

    def dump_json(self) -> str:
        return json.dumps(self.summary())


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
