"""Diagnose the Campus quality plateau (VERDICT round-4 task 3).

Usage: python scripts/diagnose_campus.py --cfg configs/demo/campus_synthetic_ref.yaml

Produces the numbers DESIGN.md's resolution hypothesis needs:
* per-axis error split — mean |dx|, |dy|, |dz| over matched predictions
  (if the plateau is image-plane quantization, the xy components dominate
  and scale with distance-to-camera; a z-dominated split would point at
  the 1D height net instead);
* PCP3D(alpha=0.5) on the synthetic held-out set, the reference's actual
  Campus metric (/root/reference/lib/dataset/campus.py:138-209) — so the
  42mm MPJPE plateau becomes comparable to the reference's 96.9 PCP;
* per-limb PCP table (which limbs fail).

Both predictions and synthetic COCO-17 GT go through the same
coco_to_campus_pose remap the reference applies to predictions, so limb
definitions match the protocol exactly.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def per_axis_split(preds, gts_list):
    """Mean per-axis abs error over matched (<500mm) predictions."""
    axis_errs = []
    for frame_preds, (gts, gt_vis) in zip(preds, gts_list):
        frame_preds = np.asarray(frame_preds, np.float64)
        valid = frame_preds[:, 0, 3] >= 0
        for gt, vis in zip(gts, gt_vis):
            v = vis > 0.1
            if not v.any() or not valid.any():
                continue
            d = frame_preds[valid][:, v, :3] - gt[None, v]
            mpjpe = np.mean(np.sqrt((d ** 2).sum(-1)), axis=-1)
            best = int(np.argmin(mpjpe))
            if mpjpe[best] < 500.0:
                axis_errs.append(np.mean(np.abs(d[best]), axis=0))
    return np.mean(axis_errs, axis=0), len(axis_errs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="configs/demo/campus_synthetic_ref.yaml")
    args = p.parse_args()

    from run.validate import evaluate_model

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.datasets.evaluate import (
        coco_to_campus_pose,
        pcp3d_metrics,
    )
    from faster_voxelpose_tpu.utils.logging_utils import create_logger

    cfg = load_config(args.cfg)
    logger, output_dir, _ = create_logger(cfg, args.cfg, "diagnose")
    metric, msg, preds, test_ds = evaluate_model(cfg, output_dir)
    print(msg)
    print(f"panoptic-protocol metric: {metric:.4f}")

    gts_list = [(r.joints_3d, r.joints_3d_vis) for r in test_ds.records]

    # 1. per-axis error split
    (ex, ey, ez), n = per_axis_split(preds, gts_list)
    exy = float(np.hypot(ex, ey))
    print(
        f"per-axis error over {n} matched poses: "
        f"|dx| {ex:.1f}mm  |dy| {ey:.1f}mm  |dz| {ez:.1f}mm  "
        f"(horizontal {exy:.1f}mm vs vertical {ez:.1f}mm)"
    )

    # 2. PCP3D(alpha=0.5), the reference Campus metric.  Synthetic GT is
    # COCO-17; remap it through the same head construction as predictions
    # so limb endpoints are protocol-identical.  "Actor" slots are the
    # per-frame person indices (synthetic scenes have no persistent
    # actors); the overall PCP is the comparable number.
    actor_gt = []
    for gts, gt_vis in gts_list:
        actor_gt.append([coco_to_campus_pose(g) for g in gts])
    avg_pcp, pcp_msg, detail = pcp3d_metrics(
        list(preds), actor_gt, coco_to_campus_pose
    )
    print(pcp_msg)
    actor_pcp = detail["actor_pcp"]
    print(
        "PCP3D(alpha=0.5) per person-slot: "
        + "  ".join(f"{v*100:.2f}" for v in actor_pcp)
    )
    print("per-limb PCP (all slots):")
    for k, v in detail["bone_pcp"].items():
        print(f"  {k:12s} {np.mean(v)*100:6.2f}")
    print(f"reference Campus PCP bar: 96.9 (real data, real heatmaps)")


if __name__ == "__main__":
    main()
