"""Per-stage timing + JAX profiler hooks (SURVEY.md §5.1 rebuild).

The reference's only observability is a frame-counter print every 100 frames
(``marker_detection.py:457-458``). Here: a ``StageTimer`` that accounts
host/device wall time per stage (blocking on device results so numbers mean
something), and a ``trace_annotation`` wrapper around
``jax.profiler.TraceAnnotation`` for XProf timelines.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulates wall time per named stage; blocks on JAX outputs."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:28s} {total * 1e3:9.1f} ms total"
                         f"  ({n}x, {total / n * 1e3:8.2f} ms avg)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_annotation(name: str):
    """XProf trace annotation (no-op if the profiler is unavailable).

    Only profiler SETUP failures are swallowed: a bare try around the yield
    would catch exceptions raised by the annotated body and yield a second
    time, which contextlib turns into a RuntimeError masking the original
    error."""
    try:
        import jax.profiler
        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:
        yield
        return
    with ctx:
        yield


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture a JAX profiler trace viewable in XProf/TensorBoard."""
    import jax.profiler
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
