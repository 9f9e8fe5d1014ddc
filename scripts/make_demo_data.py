"""Generate self-contained demo/training fixtures: a synthetic camera rig
calibration (flat {cam_id: {R,T,fx,fy,cx,cy,k,p}} format, the reference's
shelf/campus/demo convention) and a synthetic pose bank compatible with
the Synthetic dataset (reference data/panoptic_training_pose.pkl format:
a list of {'pose': (J,3) mm, 'vis': (J,4)} records).

The pose bank is procedurally generated (randomized articulated skeleton
around a root), so the full training pipeline runs with zero downloads:

    python scripts/make_demo_data.py --out data/DemoShelf --views 5
    python run/train.py --cfg configs/demo/synthetic.yaml
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_rig(n_views: int, radius_mm: float, height_mm: float, center,
             image_size, seed: int = 0):
    rng = np.random.RandomState(seed)
    cams = {}
    for v in range(n_views):
        angle = 2 * np.pi * v / n_views + rng.uniform(-0.1, 0.1)
        cam_pos = np.array(
            [
                center[0] + radius_mm * np.cos(angle),
                center[1] + radius_mm * np.sin(angle),
                height_mm,
            ]
        )
        # look at the space center (1m up)
        target = np.array([center[0], center[1], 1000.0])
        fwd = target - cam_pos
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd])  # world -> cam rows
        f = 0.9 * image_size[0]
        cams[str(v)] = {
            "R": R.tolist(),
            "T": cam_pos.reshape(3, 1).tolist(),
            "fx": f,
            "fy": f,
            "cx": image_size[0] / 2.0,
            "cy": image_size[1] / 2.0,
            "k": [[0.0], [0.0], [0.0]],
            "p": [[0.0], [0.0]],
        }
    return cams


# a 15-joint (panoptic-order) template skeleton, mm offsets from mid-hip
_SKELETON = np.array(
    [
        [0, 0, 450],      # neck
        [0, 40, 560],     # nose
        [0, 0, 0],        # mid-hip
        [150, 0, 430],    # l-shoulder
        [230, 0, 200],    # l-elbow
        [260, 30, -20],   # l-wrist
        [90, 0, -20],     # l-hip
        [100, 20, -420],  # l-knee
        [110, 0, -800],   # l-ankle
        [-150, 0, 430],   # r-shoulder
        [-230, 0, 200],   # r-elbow
        [-260, 30, -20],  # r-wrist
        [-90, 0, -20],    # r-hip
        [-100, 20, -420], # r-knee
        [-110, 0, -800],  # r-ankle
    ],
    dtype=np.float64,
)


# a 17-joint COCO-order template (nose, eyes, ears, shoulders, elbows,
# wrists, hips, knees, ankles), mm offsets from mid-hip — the joint set
# the Shelf/Campus profiles train on (configs/shelf/jln64.yaml
# NUM_JOINTS 17, ROOT_JOINT_ID [11, 12])
_SKELETON_COCO17 = np.array(
    [
        [0, 40, 560],     # nose
        [30, 55, 590],    # l-eye
        [-30, 55, 590],   # r-eye
        [70, 20, 570],    # l-ear
        [-70, 20, 570],   # r-ear
        [150, 0, 430],    # l-shoulder
        [-150, 0, 430],   # r-shoulder
        [230, 0, 200],    # l-elbow
        [-230, 0, 200],   # r-elbow
        [260, 30, -20],   # l-wrist
        [-260, 30, -20],  # r-wrist
        [90, 0, 0],       # l-hip
        [-90, 0, 0],      # r-hip
        [100, 20, -420],  # l-knee
        [-100, 20, -420], # r-knee
        [110, 0, -800],   # l-ankle
        [-110, 0, -800],  # r-ankle
    ],
    dtype=np.float64,
)

_SKELETONS = {"panoptic15": _SKELETON, "coco17": _SKELETON_COCO17}


def make_pose_bank(n_poses: int, seed: int = 1, skeleton: str = "panoptic15"):
    template = _SKELETONS[skeleton]
    rng = np.random.RandomState(seed)
    bank = []
    for _ in range(n_poses):
        jitter = rng.normal(0, 40, template.shape)
        root_height = rng.uniform(850, 1000)
        pose = template + jitter
        pose[:, 2] += root_height
        vis = np.ones((len(template), 4))
        bank.append({"pose": pose, "vis": vis})
    return bank


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/Demo")
    p.add_argument("--views", type=int, default=5)
    p.add_argument("--poses", type=int, default=500)
    p.add_argument("--radius", type=float, default=4500.0)
    p.add_argument("--image-size", type=int, nargs=2, default=[1032, 776])
    p.add_argument(
        "--skeleton", default="panoptic15", choices=sorted(_SKELETONS),
        help="joint set of the pose bank (coco17 = the Shelf/Campus set)",
    )
    p.add_argument(
        "--center", type=float, nargs=2, default=[0.0, 0.0],
        help="capture space center xy (mm); match CAPTURE_SPEC.SPACE_CENTER",
    )
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rig = make_rig(args.views, args.radius, 2200.0, tuple(args.center), args.image_size)
    with open(os.path.join(args.out, "calibration_demo.json"), "w") as f:
        json.dump(rig, f, indent=1)

    bank = make_pose_bank(args.poses, skeleton=args.skeleton)
    with open(os.path.join(args.out, "demo_pose_bank.pkl"), "wb") as f:
        pickle.dump(bank, f)

    print(f"wrote {args.views}-view rig + {args.poses}-pose bank to {args.out}")


if __name__ == "__main__":
    main()
