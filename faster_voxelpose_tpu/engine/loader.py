"""Multi-process data loading with device prefetch.

The reference leans on torch's DataLoader (8 worker processes,
run/train.py:68-73).  This is the torch-free equivalent: a process pool
renders samples (Gaussian heatmaps + targets are pure-numpy CPU work, so
workers bypass the GIL), batches are collated to pinned numpy arrays, and
an async device_put pipeline keeps one batch in flight so host rendering
overlaps device compute.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from typing import Dict, Iterator

import numpy as np

from ..datasets.base import collate

_WORKER_DATASET = None


def _worker_init(dataset_factory):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset_factory()


def _worker_get(idx: int):
    return _WORKER_DATASET[idx]


class DataLoader:
    """Map-style loader: shuffling, fixed batch size, drop_last for static
    shapes in training; sequential + padded final batch for eval."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 0,
        seed: int = 0,
        dataset_factory=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self._rng = np.random.RandomState(seed)
        self._pool = None
        if num_workers > 0:
            if dataset_factory is None:
                raise ValueError("num_workers > 0 requires dataset_factory")
            ctx = mp.get_context("fork")
            self._pool = ctx.Pool(
                num_workers, initializer=_worker_init, initargs=(dataset_factory,)
            )

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        end = len(order) - (len(order) % bs) if self.drop_last else len(order)

        for start in range(0, end, bs):
            idxs = order[start : start + bs].tolist()
            if self._pool is not None:
                samples = self._pool.map(_worker_get, idxs)
            else:
                samples = [self.dataset[i] for i in idxs]
            if len(samples) < bs:  # eval-time padding to a static shape
                samples = samples + [samples[-1]] * (bs - len(samples))
            batch = collate(samples)
            batch["_valid"] = np.arange(bs) < len(idxs)
            yield batch

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None


def prefetch_to_device(iterator, size: int = 2):
    """Wrap a host batch iterator with a background thread that stages
    device transfers `size` batches ahead (host->HBM copy overlaps the
    previous step's compute)."""
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _SENTINEL = object()

    def producer():
        try:
            for batch in iterator:
                q.put(jax.device_put(batch))
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        yield item
