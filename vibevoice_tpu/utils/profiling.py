"""Tracing / profiling helpers (SURVEY.md §5: the reference has none beyond
tqdm; here the hot phases carry XLA metadata scopes and a one-call profiler).

Usage:
    from vibevoice_tpu.utils.profiling import trace, phase

    with trace("/tmp/tb"):          # captures a TensorBoard/XProf trace
        out = generate(...)

    with phase("prefill"):          # names ops inside jit for the profiler
        ...
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile into `log_dir` (viewable with xprof/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def phase(name: str):
    """Name a region of a jitted program (shows up in profiler timelines)."""
    return jax.named_scope(name)


class StepTimer:
    """Lightweight wall-clock phase accounting for host loops."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[k]
            lines.append(f"{k}: total {self.totals[k]:.3f}s over {n} calls "
                         f"({1e3 * self.totals[k] / n:.2f} ms/call)")
        return "\n".join(lines)
