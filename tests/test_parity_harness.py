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


def test_parity_harness_image_path(tmp_path, monkeypatch):
    """The Panoptic IMAGE path through the harness: fabricated images +
    a fabricated torch backbone checkpoint resolved from weights_dir,
    converted with the real converter, driven through the backboned
    validation loop.  On a connected machine the same code path consumes
    the released pose_resnet50_panoptic.pth.tar."""
    from tests.conftest import add_reference_to_path

    if not add_reference_to_path():
        pytest.skip("reference not available")
    import cv2
    import torch

    from run_real_parity import run_parity
    from tests.test_backbone import _ref_cfg
    from tests.test_misc import TestPanopticLoader

    pan_root = str(tmp_path / "Panoptic")
    os.makedirs(pan_root)
    seq = "160906_pizza1"
    TestPanopticLoader._write_sequence(TestPanopticLoader(), pan_root, seq)
    import faster_voxelpose_tpu.datasets.panoptic as pan

    monkeypatch.setattr(pan, "VAL_SEQUENCES", [seq])

    # the fixture writes empty jpgs; make them real readable frames at
    # the (shrunk) original size
    rng = np.random.RandomState(0)
    for dirpath, _, files in os.walk(pan_root):
        for fn in files:
            if fn.endswith(".jpg"):
                cv2.imwrite(
                    os.path.join(dirpath, fn),
                    rng.randint(0, 255, (240, 320, 3), np.uint8),
                )

    # fabricated released-format backbone checkpoint (depth 18, narrow
    # deconvs: same converter/loader code path as the real 50)
    torch.manual_seed(0)
    from models import resnet as ref_resnet

    weights_dir = str(tmp_path / "weights")
    os.makedirs(weights_dir)
    ref_bb = ref_resnet.get(_ref_cfg(18, 15)).eval()
    torch.save(
        {"state_dict": ref_bb.state_dict()},
        os.path.join(weights_dir, "pose_resnet_fixture.pth.tar"),
    )

    def cfg_hook(name, cfg):
        _shrink(cfg)
        cfg.DATASET.ORI_IMAGE_SIZE = (320, 240)
        cfg.DATASET.IMAGE_SIZE = (160, 128)
        cfg.DATASET.HEATMAP_SIZE = (40, 32)
        cfg.DATASET.__post_init__()
        cfg.DATASET.TEST_HEATMAP_SRC = "image"
        cfg.RESNET.NUM_LAYERS = 18
        cfg.RESNET.NUM_DECONV_FILTERS = (32, 32, 32)
        cfg.RESNET.__post_init__()
        # a repo-relative path that does not exist: the harness must
        # fall back to weights_dir/<basename>
        cfg.NETWORK.PRETRAINED_BACKBONE = "backbone/pose_resnet_fixture.pth.tar"

    out_md = str(tmp_path / "PARITY.md")
    results = run_parity(
        data_dir=str(tmp_path),
        weights_dir=weights_dir,
        datasets=("panoptic",),
        max_frames=1,
        weights_mode="random",
        out_path=out_md,
        cfg_hook=cfg_hook,
    )
    assert results[0]["status"] == "ok"
    assert np.isfinite(results[0]["metric"])


def test_parity_harness_image_path_skips_without_backbone(tmp_path, monkeypatch):
    """image heatmap source with no backbone checkpoint anywhere ->
    recorded 'no-backbone' skip, not a crash."""
    from run_real_parity import run_parity
    from tests.test_misc import TestPanopticLoader

    pan_root = str(tmp_path / "Panoptic")
    os.makedirs(pan_root)
    seq = "160906_pizza1"
    TestPanopticLoader._write_sequence(TestPanopticLoader(), pan_root, seq)
    import faster_voxelpose_tpu.datasets.panoptic as pan

    monkeypatch.setattr(pan, "VAL_SEQUENCES", [seq])

    results = run_parity(
        data_dir=str(tmp_path),
        weights_dir=str(tmp_path / "none"),
        datasets=("panoptic",),
        weights_mode="random",
        out_path=str(tmp_path / "PARITY.md"),
    )
    assert results[0]["status"] == "no-backbone"
