"""Cooperative chip-sharing between bench.py and long-running training.

The driver runs ``bench.py`` on the real chip at round end; a training
run launched with nohup may still be alive then.  The tunnel serializes
their programs, which would poison the benchmark's timing (or starve
it).  Rather than measuring contention, the two sides cooperate through
a repo-local lock file:

* ``bench.py`` holds :func:`hold_bench_lock` around its measurements;
* the train/eval batch loops call :func:`wait_if_bench_locked` once per
  step — while the lock exists they sleep instead of dispatching, so
  the chip drains to the benchmark within one training step.

A lock older than ``STALE_S`` is ignored (a crashed bench must never
hang training), and the waiter re-checks age each poll so a stale file
left behind costs at most one poll interval.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

logger = logging.getLogger(__name__)

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LOCK_PATH = os.path.join(_REPO, ".bench_lock")
STALE_S = 1800.0  # a bench run is minutes, not half-hours
POLL_S = 2.0


def _lock_age(path: str = LOCK_PATH) -> float | None:
    """Seconds since the lock was created, or None if absent."""
    try:
        return time.time() - os.stat(path).st_mtime
    except OSError:
        return None


@contextlib.contextmanager
def hold_bench_lock(path: str = LOCK_PATH):
    """Create the lock for the duration of a benchmark run."""
    with open(path, "w") as f:
        f.write(str(os.getpid()))
    try:
        yield
    finally:
        try:
            os.remove(path)
        except OSError:
            pass


def wait_if_bench_locked(path: str = LOCK_PATH) -> float:
    """Sleep while a fresh bench lock exists; return seconds waited."""
    waited = 0.0
    announced = False
    while True:
        age = _lock_age(path)
        if age is None or age > STALE_S:
            return waited
        if not announced:
            logger.info("bench lock %s present; pausing dispatch", path)
            announced = True
        time.sleep(POLL_S)
        waited += POLL_S
