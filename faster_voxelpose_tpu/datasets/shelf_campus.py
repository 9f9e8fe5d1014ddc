"""Shelf and Campus test datasets.

Capability parity with lib/dataset/shelf.py and lib/dataset/campus.py:
test-only frame ranges, precomputed Mask R-CNN + HRNet COCO-17 2D pose
predictions as the heatmap source, actorsGT.mat 3D ground truth, the flat
{cam_id: {R,T,fx,fy,cx,cy,k,p}} calibration format, and PCP3D evaluation
(delegated to datasets/evaluate.py, including the COCO->Shelf/Campus
remapping).
"""

from __future__ import annotations

import json
import logging
import os.path as osp
import pickle
from typing import Dict, List, Tuple

import numpy as np

from ..config import Config
from .base import FrameRecord, PoseDatasetBase
from .evaluate import coco_to_campus_pose, coco_to_shelf_pose, pcp3d_metrics

logger = logging.getLogger(__name__)

SHELF_FRAME_RANGE = list(range(300, 601))
CAMPUS_FRAME_RANGE = list(range(350, 471)) + list(range(650, 751))


def load_flat_calibration(path: str) -> Dict[int, dict]:
    """{cam_id: {R, T, fx, fy, cx, cy, k, p}} JSON (shelf.py:138-153)."""
    with open(path) as f:
        cameras = json.load(f)
    return {
        int(cam_id): {k: np.array(v) for k, v in cam.items()}
        for cam_id, cam in cameras.items()
    }


def load_actors_gt(path: str):
    """actorsGT.mat -> per-actor list of per-frame (14, 3) arrays (m)."""
    import scipy.io as scio

    actor_3d = scio.loadmat(path)["actor3D"]
    return np.array(np.array(actor_3d.tolist()).tolist(), dtype=object).squeeze()


class _PredHeatmapDataset(PoseDatasetBase):
    """Shared Shelf/Campus machinery: 2D predictions -> heatmaps, GT from
    actorsGT.mat, PCP evaluation."""

    SEQ: str = ""
    FRAME_RANGE: List[int] = []
    PRED_FILE: str = ""
    CALIB_FILE: str = ""
    NUM_GT_JOINTS = 14
    REMAP = None

    def __init__(self, cfg: Config, is_train: bool = False):
        super().__init__(cfg, is_train)
        ddir = cfg.DATASET.DATADIR
        self.cameras = {self.SEQ: load_flat_calibration(osp.join(ddir, self.CALIB_FILE))}

        with open(osp.join(ddir, self.PRED_FILE), "rb") as f:
            pred_2d = pickle.load(f)

        self.actor_3d = load_actors_gt(osp.join(ddir, "actorsGT.mat"))
        self.used_frames: List[int] = []

        for fi in self.FRAME_RANGE:
            gt_poses, gt_vis = [], []
            for actor in self.actor_3d:
                pose = actor[fi] * 1000.0
                if len(pose[0]) > 0:
                    gt_poses.append(np.asarray(pose, dtype=np.float64))
                    gt_vis.append(np.ones(self.NUM_GT_JOINTS))

            all_preds = []
            for cam in range(self.num_views):
                key = f"{cam}_{fi}"
                if key not in pred_2d:
                    all_preds = None
                    break
                all_preds.append([np.array(p["pred"]) for p in pred_2d[key]])
            if all_preds is None:
                continue

            # GT is stored for evaluation only; supervision arrays are not
            # built for these COCO-headed test sets (the model outputs
            # COCO-17, GT is Shelf/Campus-14).
            self.records.append(
                FrameRecord(seq=self.SEQ, pred_pose2d=all_preds)
            )
            self.used_frames.append(fi)
        logger.info(
            "=> %d %s frames loaded from %d views",
            len(self.records), self.SEQ, self.num_views,
        )

    def evaluate(self, preds: np.ndarray) -> Tuple[float, str]:
        actor_gt = [
            [np.asarray(actor[fi] * 1000.0) for actor in self.actor_3d]
            for fi in self.used_frames
        ]
        metric, msg, _ = pcp3d_metrics(list(preds), actor_gt, self.REMAP)
        return metric, msg


class ShelfDataset(_PredHeatmapDataset):
    SEQ = "shelf"
    FRAME_RANGE = SHELF_FRAME_RANGE
    PRED_FILE = "pred_shelf_maskrcnn_hrnet_coco.pkl"
    CALIB_FILE = "calibration_shelf.json"
    REMAP = staticmethod(coco_to_shelf_pose)


class CampusDataset(_PredHeatmapDataset):
    SEQ = "campus"
    FRAME_RANGE = CAMPUS_FRAME_RANGE
    PRED_FILE = "pred_campus_maskrcnn_hrnet_coco.pkl"
    CALIB_FILE = "calibration_campus.json"
    REMAP = staticmethod(coco_to_campus_pose)
