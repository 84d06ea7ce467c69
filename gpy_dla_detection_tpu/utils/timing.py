"""Tracing and per-stage timing.

The reference's only observability is wall-clock prints per spectrum
(reference: run_bayes_select.py:142,232-234, MATLAB tic/toc).  Here
timers are first-class: a ``StageTimer`` accumulates named stages, and
``trace`` wraps ``jax.profiler`` for XLA-level traces viewable in
TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulating named-stage wall-clock timer."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:<30} {t:8.3f}s  ({c} calls, {t / c * 1e3:8.2f} ms/call)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gpy_dla_trace"):
    """XLA-level profiler trace around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, repeats: int = 3, **kw):
    """(result, best_seconds) of a jitted call, excluding compile."""
    import jax

    out = jax.block_until_ready(fn(*args, **kw))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return out, best
