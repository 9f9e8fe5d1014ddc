"""Cooperative bench/training chip-sharing (utils/bench_lock.py).

bench.py holds the lock while the driver measures; training loops call
wait_if_bench_locked each step and must (a) pass through instantly with
no lock, (b) block until the lock is released, (c) ignore a stale lock
left by a crashed bench.
"""

import os
import threading
import time

from faster_voxelpose_tpu.utils import bench_lock
from faster_voxelpose_tpu.utils.bench_lock import (
    hold_bench_lock,
    wait_if_bench_locked,
)


def test_no_lock_is_free(tmp_path):
    path = str(tmp_path / "lock")
    t0 = time.time()
    assert wait_if_bench_locked(path) == 0.0
    assert time.time() - t0 < 0.5


def test_waits_until_released(tmp_path, monkeypatch):
    monkeypatch.setattr(bench_lock, "POLL_S", 0.05)
    path = str(tmp_path / "lock")
    release_after = 0.3

    def _bench():
        with hold_bench_lock(path):
            time.sleep(release_after)

    t = threading.Thread(target=_bench)
    t.start()
    time.sleep(0.1)  # let the bench thread take the lock
    t0 = time.time()
    waited = wait_if_bench_locked(path)
    elapsed = time.time() - t0
    t.join()
    assert waited > 0.0
    assert elapsed >= 0.1  # actually blocked
    assert not os.path.exists(path)  # released on exit


def test_stale_lock_ignored(tmp_path):
    path = str(tmp_path / "lock")
    with open(path, "w") as f:
        f.write("dead")
    old = time.time() - bench_lock.STALE_S - 60
    os.utime(path, (old, old))
    t0 = time.time()
    assert wait_if_bench_locked(path) == 0.0
    assert time.time() - t0 < 0.5


def test_hold_removes_on_error(tmp_path):
    path = str(tmp_path / "lock")
    try:
        with hold_bench_lock(path):
            assert os.path.exists(path)
            raise RuntimeError("bench crashed")
    except RuntimeError:
        pass
    assert not os.path.exists(path)
