"""Durable npz best-model snapshots (engine/checkpoint.py).

The reference distributes trained weights as model_best.pth.tar
(README.md model zoo); our equivalent is a path-keyed compressed npz
that restores into any template with the same tree structure.
"""

import numpy as np
import pytest

from faster_voxelpose_tpu.engine.checkpoint import (
    load_best_npz,
    save_best_npz,
)


def _tree():
    return {
        "params": {
            "dense": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4),
                      "bias": np.ones((4,), np.float32)},
            "conv": {"kernel": np.full((2, 2, 1, 3), 0.5, np.float32)},
        },
        "batch_stats": {"bn": {"mean": np.zeros((3,), np.float32)}},
    }


def test_npz_round_trip(tmp_path):
    tree = _tree()
    path = str(tmp_path / "model_best.npz")
    save_best_npz(path, tree)
    template = {
        k: {k2: {k3: np.zeros_like(v3) for k3, v3 in v2.items()}
            for k2, v2 in v.items()}
        for k, v in tree.items()
    }
    restored = load_best_npz(path, template)
    import jax

    flat_a = jax.tree_util.tree_leaves(tree)
    flat_b = jax.tree_util.tree_leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)


def test_npz_shape_mismatch_rejected(tmp_path):
    tree = _tree()
    path = str(tmp_path / "model_best.npz")
    save_best_npz(path, tree)
    bad = _tree()
    bad["params"]["dense"]["kernel"] = np.zeros((5, 4), np.float32)
    with pytest.raises(ValueError, match="snapshot shape"):
        load_best_npz(path, bad)


def test_npz_missing_key_rejected(tmp_path):
    tree = _tree()
    path = str(tmp_path / "model_best.npz")
    save_best_npz(path, tree)
    bigger = _tree()
    bigger["params"]["extra"] = {"w": np.zeros((2,), np.float32)}
    with pytest.raises(KeyError, match="missing array"):
        load_best_npz(path, bigger)
