"""Tracing / profiling utilities.

The reference's only instrumentation is ``time.time()`` around retrieval
calls (benchmark_utils.py:646-649) — SURVEY.md §5 calls for jax.profiler
traces + per-phase timing as the TPU equivalent.  This module provides:

  * ``PhaseTimer`` — nested named phases with device sync, summary table;
  * ``trace(...)`` — context manager around ``jax.profiler`` writing a
    TensorBoard-compatible trace directory;
  * ``annotate(...)`` — ``jax.profiler.TraceAnnotation`` passthrough so
    host-side phases show up inside device timelines.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulating named-phase wall timer with optional device sync."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    def _sync(self):
        if self.sync:
            try:
                import jax
                jax.effects_barrier()
            except Exception:
                pass

    @contextlib.contextmanager
    def phase(self, name: str):
        self._sync()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._sync()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = [f"{'phase':<28} {'total_s':>9} {'calls':>6} {'mean_ms':>9}"]
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name:<28} {total:>9.3f} {n:>6} {1000 * total / n:>9.3f}"
            )
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {
            name: {"total_s": self.totals[name], "calls": self.counts[name]}
            for name in self.totals
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rag_cobweb_tpu_trace",
          host_tracer_level: int = 2):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)
