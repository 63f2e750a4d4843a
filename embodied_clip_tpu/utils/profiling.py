"""Tracing / profiling utilities (SURVEY.md §5: a gap in the reference — it ships no
profiling at all; log-noise suppression only).

StageTimer gives per-stage wall-time accounting for the RL loop's three hot stages
(env-step / encode / update) as first-class trainer metrics; `trace` wraps
jax.profiler for on-demand device traces viewable in TensorBoard/perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

__all__ = ["StageTimer", "trace"]


class StageTimer:
    """Accumulates wall time per named stage; `summary()` returns seconds and shares."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        total = sum(self.totals.values()) or 1.0
        out: Dict[str, float] = {}
        for name, secs in self.totals.items():
            out[f"{name}_s"] = secs
            out[f"{name}_frac"] = secs / total
            out[f"{name}_calls"] = float(self.counts[name])
        return out

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
