"""Profiling and step timing.

The reference has no tracing/profiling at all (SURVEY.md §5 — only FLOPs
printers in vendored Swin code). Here: a jax.profiler trace context for
TensorBoard-viewable device traces, and a StepTimer that emits the
north-star images/sec metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard / Perfetto:

        with profiling.trace("runs/trace"):
            step(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates step wall times and item counts → images/sec.

    Call `tick(n_items)` after each completed (host-synchronized) step."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._t0: Optional[float] = None
        self.items = 0
        self.steps = 0
        self.elapsed = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def tick(self, n_items: int) -> None:
        now = time.perf_counter()
        if self._t0 is not None:
            self.elapsed += now - self._t0
        self._t0 = now
        self.items += n_items
        self.steps += 1

    @property
    def images_per_sec(self) -> float:
        return self.items / self.elapsed if self.elapsed > 0 else 0.0

    def summary(self) -> dict:
        return {
            "images_per_sec": self.images_per_sec,
            "steps": self.steps,
            "elapsed_sec": self.elapsed,
        }
