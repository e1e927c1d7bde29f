"""Lightweight step/epoch timing + optional jax profiler tracing.

The reference's only observability is coarse wall-clock prints
(SURVEY.md §5); here timing is structured and an XLA profiler trace can be
captured around any window with ``trace_dir``.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional


class StepTimer:
    def __init__(self):
        self.t0 = time.time()
        self.count = 0
        self.total = 0.0

    def tick(self, n: int = 1):
        now = time.time()
        self.total += now - self.t0
        self.count += n
        self.t0 = now

    @property
    def rate(self) -> float:
        return self.count / self.total if self.total > 0 else 0.0

    def reset(self):
        self.t0 = time.time()
        self.count = 0
        self.total = 0.0


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """jax.profiler trace window when trace_dir is set; no-op otherwise."""
    if trace_dir:
        import jax
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
