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


class TestTwoProcessPodSimulation:
    """Simulate a 2-host DCN pod inside one test: two DataLoaders with
    process_count=2 iterated to exhaustion.  Invariants that keep a real
    SPMD pod alive: every host yields the SAME number of batches (a host
    with one extra batch would run one extra collective and deadlock),
    shards are disjoint, and their union covers the dataset up to the
    documented < process_count truncated remainder per epoch."""

    def _hosts(self, n, bs, shuffle=False, drop_last=False, seed=0):
        return [
            DataLoader(
                ToyDataset(n), bs, shuffle=shuffle, drop_last=drop_last,
                seed=seed, process_count=2, process_index=p,
            )
            for p in range(2)
        ]

    def test_equal_batch_counts_across_awkward_sizes(self):
        # sizes chosen so naive strided slicing WOULD give hosts unequal
        # record counts (odd n) and unequal batch counts without the
        # per-host truncation
        for n in (7, 9, 17, 31, 33):
            for bs in (2, 4):
                for drop_last in (False, True):
                    h0, h1 = self._hosts(n, bs, drop_last=drop_last)
                    b0, b1 = list(h0), list(h1)
                    assert len(b0) == len(b1) == len(h0) == len(h1), (
                        n, bs, drop_last, len(b0), len(b1),
                    )

    def test_disjoint_shards_cover_dataset(self):
        n, bs = 17, 4
        h0, h1 = self._hosts(n, bs)
        seen0 = [i for b in h0 for i, v in zip(b["idx"], b["_valid"]) if v]
        seen1 = [i for b in h1 for i, v in zip(b["idx"], b["_valid"]) if v]
        assert not set(seen0) & set(seen1)  # disjoint
        # equal-truncation drops n % 2 = 1 record this epoch
        assert len(set(seen0) | set(seen1)) == (n // 2) * 2

    def test_shuffled_epochs_rotate_the_dropped_remainder(self):
        # the truncated remainder must not starve the same records every
        # epoch: with shuffling, coverage over a few epochs is complete
        n, bs, epochs = 9, 2, 6
        h0, h1 = self._hosts(n, bs, shuffle=True, seed=5)
        union = set()
        for _ in range(epochs):
            for h in (h0, h1):
                for b in h:
                    union.update(int(i) for i, v in zip(b["idx"], b["_valid"]) if v)
        assert union == set(range(n))

    def test_spmd_global_step_from_two_host_shards(self):
        """jax.distributed-free SPMD simulation: each 'host' contributes
        its per-host batch; the global batch formed exactly as a pod's
        in_shardings would lay it out runs one dp step on the 8-device
        CPU mesh, and both hosts agree on the step count."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        n, per_host_bs = 12, 2
        h0, h1 = self._hosts(n, per_host_bs, shuffle=True, seed=1)
        devices = np.array(jax.devices()[:2])
        mesh = Mesh(devices, ("data",))
        sharding = NamedSharding(mesh, P("data"))

        @jax.jit
        def step(x):
            return jax.lax.with_sharding_constraint(x, sharding).sum()

        steps = 0
        for b0, b1 in zip(h0, h1, strict=True):  # strict: equal counts
            global_x = np.concatenate([b0["x"], b1["x"]], axis=0)
            out = step(jax.device_put(global_x, sharding))
            assert np.isfinite(float(out))
            steps += 1
        assert steps == len(h0)
