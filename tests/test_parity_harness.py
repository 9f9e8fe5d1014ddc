"""Dry-run of the real-data parity harness (scripts/run_real_parity.py)
on fabricated mini-datasets: proves the driver — config load, dataset
build, weight resolution, batched validation, metric protocol, PARITY.md
emission — end to end before it ever meets real data (the build box has
no network egress; see docs/REAL_DATA.md)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))


def _shrink(cfg):
    """Keep the real config's structure but shrink the voxel grids so the
    CPU dry-run compiles in seconds (the driver itself is profile-
    agnostic; full-profile compiles are covered by -m slow tests)."""
    cfg.CAPTURE_SPEC.VOXELS_PER_AXIS = (16, 16, 8)
    cfg.CAPTURE_SPEC.MAX_PEOPLE = 4
    cfg.INDIVIDUAL_SPEC.VOXELS_PER_AXIS = (16, 16, 16)
    cfg.CAPTURE_SPEC.__post_init__()
    cfg.INDIVIDUAL_SPEC.__post_init__()
    cfg.TEST.BATCH_SIZE = 1
    cfg.WORKERS = 0
    cfg.NETWORK.COMPUTE_DTYPE = "float32"


def test_parity_harness_dry_run(tmp_path, monkeypatch):
    from run_real_parity import run_parity

    # --- fabricated Shelf (reuses the loader-test fixture builder) -----
    from tests.test_shelf_campus_loader import write_fixtures

    shelf_root = str(tmp_path / "Shelf")
    os.makedirs(shelf_root)
    frames = [300, 301, 302, 305]
    write_fixtures(shelf_root, frames)

    # --- fabricated Panoptic (reuses the loader-test builder) ----------
    from tests.test_misc import TestPanopticLoader

    pan_root = str(tmp_path / "Panoptic")
    os.makedirs(pan_root)
    seq = "160906_pizza1"
    TestPanopticLoader._write_sequence(TestPanopticLoader(), pan_root, seq)
    import faster_voxelpose_tpu.datasets.panoptic as pan

    monkeypatch.setattr(pan, "VAL_SEQUENCES", [seq])

    def cfg_hook(name, cfg):
        _shrink(cfg)
        if name == "panoptic":
            cfg.DATASET.TEST_HEATMAP_SRC = "gt"  # no backbone checkpoint
        if name == "shelf":
            cfg.DATASET.CAMERA_NUM = 3  # fixture rig size

    def dataset_hook(name, cfg):
        from faster_voxelpose_tpu.datasets import get_dataset

        if name == "shelf":
            from faster_voxelpose_tpu.datasets.shelf_campus import ShelfDataset

            monkeypatch.setattr(ShelfDataset, "FRAME_RANGE", frames)
        return get_dataset(cfg.DATASET.TEST_DATASET)(cfg, is_train=False)

    out_md = str(tmp_path / "PARITY.md")
    results = run_parity(
        data_dir=str(tmp_path),
        datasets=("panoptic", "shelf"),
        max_frames=2,
        weights_mode="random",
        out_path=out_md,
        cfg_hook=cfg_hook,
        dataset_hook=dataset_hook,
    )

    assert [r["status"] for r in results] == ["ok", "ok"]
    for r in results:
        assert np.isfinite(r["metric"])
        assert r["frames"] >= 1
    text = open(out_md).read()
    assert "panoptic" in text and "shelf" in text
    assert "AP25 86.66" in text and "PCP3D 97.6" in text  # zoo anchors


def test_parity_harness_skips_missing(tmp_path):
    """Absent data or checkpoints degrade to recorded skips, never
    crashes — the turnkey script must survive partial downloads."""
    from run_real_parity import run_parity

    out_md = str(tmp_path / "PARITY.md")
    results = run_parity(
        data_dir=str(tmp_path / "nowhere"),
        weights_dir=str(tmp_path / "nowhere"),
        datasets=("campus",),
        weights_mode="torch",
        out_path=out_md,
    )
    assert results[0]["status"] in ("no-data", "no-weights")
    assert "campus" in open(out_md).read()
