"""Integrity of the committed model zoo (checkpoints/<profile>/).

The reference ships downloadable trained weights (README.md:123-131
model zoo); our equivalent is the git-committed
``checkpoints/<profile>/model_best.npz`` + ``eval_record.json`` pairs
that ``load_best_model`` falls back to.  This test guards the actual
committed artifacts: every snapshot must restore into the model built
from the config its eval record names (key-set and shape agreement),
and must contain trained — not placeholder — weights.

Template shapes come from ``jax.eval_shape`` over ``model.init`` so no
forward pass runs; the whole sweep is a few seconds on CPU.
"""

import glob
import json
import os

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZOO = sorted(
    d for d in glob.glob(os.path.join(REPO, "checkpoints", "*"))
    if os.path.isfile(os.path.join(d, "model_best.npz"))
)


def _record(d):
    with open(os.path.join(d, "eval_record.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("snap_dir", ZOO, ids=[os.path.basename(d) for d in ZOO])
def test_zoo_snapshot_matches_config(snap_dir):
    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.engine.checkpoint import load_best_npz
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model

    rec = _record(snap_dir)
    # records are written with absolute paths on the training box; remap
    cfg_path = os.path.join(REPO, os.path.relpath(rec["config"], "/root/repo")) \
        if rec["config"].startswith("/") else os.path.join(REPO, rec["config"])
    assert os.path.isfile(cfg_path), f"eval record names missing config {cfg_path}"
    assert isinstance(rec["epoch"], int) and rec["epoch"] >= 0
    assert 0.0 <= rec["metric"] <= 1.0
    assert "seed" in rec

    cfg = load_config(cfg_path)
    model = build_model(cfg)
    B, V = 1, cfg.DATASET.CAMERA_NUM
    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    import functools

    shapes = jax.eval_shape(
        functools.partial(model.init, train=False),  # keep `train` static
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((B, V, H, W, J), np.float32),
        jax.ShapeDtypeStruct((B, V, 21), np.float32),
    )
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes
    )
    # raises KeyError/ValueError on any key-set or shape disagreement
    restored = load_best_npz(os.path.join(snap_dir, "model_best.npz"), template)

    # trained, not placeholder: conv/dense kernels must have real spread
    kernels = [
        np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(restored)[0]
        if str(path[-1]) == "['kernel']" or getattr(path[-1], "key", "") == "kernel"
    ]
    assert kernels, "snapshot restored no kernel arrays"
    spread = max(float(np.std(k)) for k in kernels)
    assert spread > 1e-4, f"all kernels near-constant (max std {spread})"


def test_zoo_is_nonempty():
    # the repo ships at least the three benchmark profiles
    names = {os.path.basename(d) for d in ZOO}
    for profile in ("shelf_synthetic_ref", "campus_synthetic", "panoptic_synthetic"):
        assert profile in names, f"model zoo missing {profile}"
