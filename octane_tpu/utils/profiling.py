"""Profiling / tracing.

The reference has no instrumentation at all (SURVEY.md section 5: an unused
<ctime> include and cout progress lines).  This module provides:

  * StageTimer -- wall-clock stage accounting with device sync, for pipeline
    stage breakdowns (the numbers behind bench.py);
  * trace() -- a context manager around jax.profiler for full XLA traces
    (viewable in TensorBoard / Perfetto) on backends that support it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Tuple

import jax


class StageTimer:
    """Accumulates wall-clock durations per named stage.

    Forces device synchronization (a cheap readback) at stage end so timings
    are attributable; use only for coarse stage accounting.
    """

    def __init__(self):
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> List[Tuple[str, int, float, float]]:
        """[(stage, count, total_s, mean_s)] ordered by total time."""
        rows = [(k, len(v), sum(v), sum(v) / len(v))
                for k, v in self.records.items()]
        return sorted(rows, key=lambda r: -r[2])

    def report(self) -> str:
        lines = [f"{'stage':<28}{'n':>5}{'total_ms':>12}{'mean_ms':>12}"]
        for name, n, tot, mean in self.summary():
            lines.append(f"{name:<28}{n:>5}{tot * 1e3:>12.2f}{mean * 1e3:>12.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace; no-op if the backend lacks profiler support."""
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
