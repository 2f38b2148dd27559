"""Tracing / profiling utilities.

The reference has no tracing at all — only wall-clock timing with CUDA
sync (/root/reference/utils.py:448-464; SURVEY.md §5). Here profiling
is a first-class utility: jax.profiler traces (viewable in
TensorBoard/XProf) plus lightweight named phase timers whose output
feeds the same t_compress/t_decompress CSV columns.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulating named phase timer with device synchronization."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = True):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, float]:
        return {
            name: {"total_s": total, "count": self.counts[name],
                   "mean_s": total / self.counts[name]}
            for name, total in self.totals.items()
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Wrap a region in a jax.profiler trace (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
