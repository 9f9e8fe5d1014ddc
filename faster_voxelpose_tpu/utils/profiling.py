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


class _StepHandle:
    """Mutable handle yielded by StepTimer.step: the caller deposits the
    device result produced inside the context so the timer can block on
    it AFTER host dispatch time is recorded (results don't exist yet
    when the context opens, so they can't be passed as arguments)."""

    def __init__(self):
        self.result = None

    def set(self, result):
        self.result = result


class StepTimer:
    """Tracks per-step host wall time and synchronized device time.

    host_s counts only the dispatch section (everything inside the
    context); device_s additionally includes block_until_ready on the
    result deposited via the yielded handle — keep host-side fetches
    (np.asarray) OUTSIDE the context or the two numbers collapse."""

    def __init__(self):
        self.host_s = 0.0
        self.device_s = 0.0
        self.steps = 0

    @contextlib.contextmanager
    def step(self, result_to_block=None):
        import jax

        handle = _StepHandle()
        t0 = time.perf_counter()
        yield handle
        t1 = time.perf_counter()
        blockable = (
            handle.result if handle.result is not None else result_to_block
        )
        if blockable is not None:
            jax.block_until_ready(blockable)
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
