"""Profiling and telemetry.

Replaces the reference's RAYS_STATISTICS counter + clock() phase timing +
occupancy printouts (SURVEY.md §5 tracing/profiling: Defines.h:49-50,
Main.cpp:64-119, Occupancy.cuh) with: a context-managed phase timer, the
rays/sec counter every scheduler already carries in its wavefront state,
and jax.profiler trace capture for XLA-level analysis.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class PhaseTimer:
    """Wall-clock phase timing (the reference's startT/endT pairs)."""

    phases: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.time() - t0

    def report(self) -> str:
        return " | ".join(
            f"{k}: {v:.2f}s" for k, v in self.phases.items()
        )


@dataclass
class RenderStats:
    """Per-run statistics mirroring runTest's protocol (Main.cpp:46-121):
    discard-first-trial mean/std, paths/s, Mrays/s."""

    times: List[float] = field(default_factory=list)
    rays: List[float] = field(default_factory=list)

    def add_trial(self, elapsed: float, n_rays: float, first: bool):
        if not first or len(self.times) == 0 and first is False:
            pass
        if not first:
            self.times.append(elapsed)
            self.rays.append(n_rays)

    def summary(self, n_paths: int) -> dict:
        import numpy as np

        if not self.times:
            return {}
        mean_t = float(np.mean(self.times))
        return {
            "mean_time_s": mean_t,
            "std_time_s": float(np.std(self.times)),
            "paths_per_sec": n_paths / mean_t,
            "mrays_per_sec": float(np.mean(self.rays)) / (mean_t * 1e6),
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace capture; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def emit_json_line(metric: str, value: float, unit: str, baseline: float):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": unit,
                "vs_baseline": round(value / baseline, 3) if baseline else None,
            }
        )
    )
