"""Profiling / tracing utilities.

The reference's only observability is an on-screen FPS counter
(`/root/reference/python/src/inference.py:107-110`, `cpp/src/main.cc:104-111`).
Here: `jax.profiler` trace capture (viewable in TensorBoard / Perfetto),
named step annotations, and a simple wall-clock timer for steady-state
throughput numbers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: ``with trace('/tmp/tb'): run_steps()`` then
    open TensorBoard's profile tab (or Perfetto) on ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTraceWindow:
    """Trace a window of training steps (post-compile) into ``log_dir``.

    ``tick(i)`` starts the capture at step ``start`` and stops it at step
    ``stop``; ``close()`` stops it early if the loop ends inside the window.
    Used by ``train.trainer`` when ``FPC_PROFILE_DIR`` is set.
    """

    def __init__(self, log_dir: str, start: int = 5, stop: int = 15):
        self.log_dir = log_dir
        self.start = start
        self.stop = stop
        self._active = False

    def tick(self, i: int) -> None:
        if not self.log_dir:
            return
        if i == self.start and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif i == self.stop and self._active:
            self.close()

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            print(f"[profiling] step trace written to {self.log_dir}")


class Throughput:
    """Steady-state items/sec meter (skips the first, compile-bearing call)."""

    def __init__(self):
        self.n = 0
        self.t0 = None

    def step(self, items: int = 1) -> None:
        if self.t0 is None:
            self.t0 = time.perf_counter()
            return
        self.n += items

    @property
    def per_sec(self) -> float:
        if self.t0 is None or self.n == 0:
            return 0.0
        return self.n / (time.perf_counter() - self.t0)
