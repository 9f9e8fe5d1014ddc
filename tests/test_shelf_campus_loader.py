"""Shelf/Campus dataset loaders exercised on fabricated fixtures:
a synthetic actorsGT.mat, precomputed-2D-prediction pkls in the reference's
{'<cam>_<frame>': [{'pred': (17,3)}, ...]} format, and a flat calibration
JSON.  Validates record construction, heatmap rendering from predictions,
and the PCP evaluation path end to end (no real dataset needed)."""

import json
import os
import pickle

import numpy as np
import pytest

from faster_voxelpose_tpu.config import Config
from faster_voxelpose_tpu.datasets import evaluate as ev
from tests.test_geometry import make_camera


def write_fixtures(root, frames, num_views=3, num_actors=2, seed=0):
    import scipy.io as scio

    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)

    # calibration
    cams = {}
    for v in range(num_views):
        c = make_camera(v)
        cams[str(v)] = {
            "R": c["R"].tolist(),
            "T": c["T"].tolist(),
            "fx": float(c["fx"]),
            "fy": float(c["fy"]),
            "cx": float(c["cx"]),
            "cy": float(c["cy"]),
            "k": c["k"].tolist(),
            "p": c["p"].tolist(),
        }
    with open(os.path.join(root, "calibration_shelf.json"), "w") as f:
        json.dump(cams, f)

    # actorsGT.mat: actor3D cell array; per actor, per frame (14,3) in m
    # (empty (1,0) entry when absent) — reference shelf.py:93-96 layout
    max_frame = max(frames) + 1
    coco_truth = {}
    actors = np.empty((num_actors, 1), dtype=object)
    for a in range(num_actors):
        per_frame = np.empty((max_frame, 1), dtype=object)
        for fi in range(max_frame):
            if fi in frames:
                coco = rng.uniform(-1.5, 1.5, (17, 3)) + np.array([0, 0, 1.0])
                coco_truth[(a, fi)] = coco
                per_frame[fi, 0] = ev.coco_to_shelf_pose(coco * 1000.0) / 1000.0
            else:
                per_frame[fi, 0] = np.zeros((1, 0))
        actors[a, 0] = per_frame
    scio.savemat(os.path.join(root, "actorsGT.mat"), {"actor3D": actors})

    # precomputed 2D predictions keyed '<cam>_<frame>'
    preds = {}
    for fi in frames:
        for v in range(num_views):
            entries = []
            for a in range(num_actors):
                pred2d = rng.uniform(0, 700, (17, 2))
                score = rng.rand(17, 1)
                entries.append({"pred": np.concatenate([pred2d, score], 1)})
            preds[f"{v}_{fi}"] = entries
    with open(os.path.join(root, "pred_shelf_maskrcnn_hrnet_coco.pkl"), "wb") as f:
        pickle.dump(preds, f)
    return coco_truth


@pytest.fixture(scope="module")
def shelf_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("shelf"))
    frames = [300, 301, 302, 305]
    truth = write_fixtures(root, frames)

    from faster_voxelpose_tpu.datasets.shelf_campus import ShelfDataset

    cfg = Config()
    cfg.DATASET.DATADIR = root
    cfg.DATASET.CAMERA_NUM = 3
    cfg.DATASET.NUM_JOINTS = 17
    cfg.DATASET.ROOT_JOINT_ID = [11, 12]
    cfg.DATASET.ORI_IMAGE_SIZE = (1032, 776)
    cfg.DATASET.IMAGE_SIZE = (800, 608)
    cfg.DATASET.HEATMAP_SIZE = (200, 152)
    cfg.DATASET.TEST_HEATMAP_SRC = "pred"
    cfg.DATASET.__post_init__()

    ds = ShelfDataset.__new__(ShelfDataset)
    ShelfDataset.FRAME_RANGE = frames  # restrict to fixture frames
    ds.__init__(cfg, is_train=False)
    return ds, truth, frames


def test_loader_builds_records(shelf_ds):
    ds, truth, frames = shelf_ds
    assert len(ds) == len(frames)
    sample = ds[0]
    assert sample["input_heatmaps"].shape == (3, 152, 200, 17)
    assert sample["cameras"].shape == (3, 21)
    assert 0.0 <= sample["input_heatmaps"].max() <= 1.0
    assert sample["input_heatmaps"].max() > 0.3  # gaussians actually rendered


def test_pcp_evaluation_with_perfect_predictions(shelf_ds):
    ds, truth, frames = shelf_ds
    K, J = 4, 17
    preds = np.zeros((len(frames), K, J, 5), np.float32)
    preds[:, :, :, 3] = -1.0
    for i, fi in enumerate(frames):
        for a in range(2):
            preds[i, a, :, :3] = truth[(a, fi)] * 1000.0  # m -> mm, COCO order
            preds[i, a, :, 3] = 0.0
            preds[i, a, :, 4] = 0.9
    metric, msg = ds.evaluate(preds)
    assert metric == pytest.approx(1.0), msg


def test_pcp_evaluation_with_garbage_predictions(shelf_ds):
    ds, truth, frames = shelf_ds
    K, J = 4, 17
    preds = np.zeros((len(frames), K, J, 5), np.float32)
    preds[:, :, :, :3] = 99999.0
    preds[:, :, :, 3] = 0.0
    metric, msg = ds.evaluate(preds)
    assert metric < 0.2
