"""DataLoader / prefetch tests: batching, shuffling, drop_last, eval-time
padding, and the device-prefetch wrapper."""

import numpy as np

from faster_voxelpose_tpu.engine.loader import DataLoader, prefetch_to_device


class ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32), "idx": np.int32(i)}


def test_batching_and_drop_last():
    dl = DataLoader(ToyDataset(10), batch_size=4, shuffle=False, drop_last=True)
    batches = list(dl)
    assert len(dl) == 2 and len(batches) == 2
    np.testing.assert_array_equal(batches[0]["idx"], [0, 1, 2, 3])
    np.testing.assert_array_equal(batches[1]["idx"], [4, 5, 6, 7])
    assert batches[0]["x"].shape == (4, 3)
    assert batches[0]["_valid"].all()


def test_eval_padding_and_valid_mask():
    dl = DataLoader(ToyDataset(10), batch_size=4, shuffle=False, drop_last=False)
    batches = list(dl)
    assert len(batches) == 3
    last = batches[-1]
    # final partial batch padded to the static batch size by repetition
    np.testing.assert_array_equal(last["idx"], [8, 9, 9, 9])
    np.testing.assert_array_equal(last["_valid"], [True, True, False, False])


def test_shuffle_is_seeded_and_complete():
    a = [b["idx"].tolist() for b in DataLoader(ToyDataset(8), 4, shuffle=True, seed=3)]
    b = [b["idx"].tolist() for b in DataLoader(ToyDataset(8), 4, shuffle=True, seed=3)]
    c = [b["idx"].tolist() for b in DataLoader(ToyDataset(8), 4, shuffle=True, seed=4)]
    assert a == b  # deterministic per seed
    assert sorted(sum(a, [])) == list(range(8))  # a permutation
    assert a != c  # seed actually changes order


def test_prefetch_preserves_order_and_values():
    dl = DataLoader(ToyDataset(6), batch_size=2, shuffle=False)
    direct = [b["idx"].tolist() for b in dl]
    prefetched = [
        np.asarray(b["idx"]).tolist() for b in prefetch_to_device(iter(dl), size=2)
    ]
    assert prefetched == direct
