"""Profiling / tracing hooks.

The reference's observability is wall-clock meters + CUDA memory prints
(lib/core/function.py:80-99).  TPU equivalent: jax.profiler traces (viewable
in TensorBoard/Perfetto) around any pipeline section, plus simple step
timers that distinguish host time from device time via block_until_ready.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into log_dir (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Tracks per-step host wall time and synchronized device time."""

    def __init__(self):
        self.host_s = 0.0
        self.device_s = 0.0
        self.steps = 0

    @contextlib.contextmanager
    def step(self, result_to_block=None):
        import jax

        t0 = time.perf_counter()
        yield
        t1 = time.perf_counter()
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        t2 = time.perf_counter()
        self.host_s += t1 - t0
        self.device_s += t2 - t0
        self.steps += 1

    def summary(self) -> str:
        if not self.steps:
            return "no steps"
        return (
            f"{self.steps} steps: host {self.host_s / self.steps * 1e3:.1f} ms/step, "
            f"host+device {self.device_s / self.steps * 1e3:.1f} ms/step"
        )
