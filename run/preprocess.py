"""One-time on-disk resize of dataset images to the network input size.

Capability parity with the reference's preprocess.py: warps every dataset
image through the shared original->input affine so training/eval skip the
per-frame warp.  Unlike the reference (which overwrites in place), images
are only rewritten when their size differs from the target, making the
script idempotent.

    python run/preprocess.py --cfg configs/panoptic/jln64.yaml [--workers 8]
"""

from __future__ import annotations

import argparse
import os
import sys
from multiprocessing import get_context

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Resize dataset images in place")
    p.add_argument("--cfg", required=True)
    p.add_argument("--workers", type=int, default=4)
    return p.parse_args()


_TRANSFORM = None
_SIZE = None


def _init(transform, size):
    global _TRANSFORM, _SIZE
    _TRANSFORM, _SIZE = transform, size


def _process(path: str) -> bool:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
    if img is None:
        return False
    W, H = _SIZE
    if img.shape[1] == W and img.shape[0] == H:
        return False
    out = cv2.warpAffine(
        img, _TRANSFORM.astype(np.float32), (W, H), flags=cv2.INTER_LINEAR
    )
    cv2.imwrite(path, out)
    return True


def main():
    args = parse_args()

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.datasets import get_dataset
    from faster_voxelpose_tpu.geometry.transforms import get_resize_transform

    cfg = load_config(args.cfg)
    transform = get_resize_transform(cfg.DATASET.ORI_IMAGE_SIZE, cfg.DATASET.IMAGE_SIZE)

    paths = []
    for is_train in (True, False):
        try:
            ds = get_dataset(
                cfg.DATASET.TRAIN_DATASET if is_train else cfg.DATASET.TEST_DATASET
            )(cfg, is_train=is_train)
        except (FileNotFoundError, KeyError):
            continue
        for rec in ds.records:
            if rec.image_paths:
                paths.extend(rec.image_paths)

    print(f"{len(paths)} images to check")
    # spawn, not fork: dataset construction above may initialize JAX
    # (device-render paths), and forking a multithreaded process can
    # deadlock the children; workers only need cv2 + the affine anyway
    ctx = get_context("spawn")
    with ctx.Pool(args.workers, initializer=_init, initargs=(transform, cfg.DATASET.IMAGE_SIZE)) as pool:
        changed = sum(pool.map(_process, paths))
    print(f"resized {changed} images to {cfg.DATASET.IMAGE_SIZE}")


if __name__ == "__main__":
    main()
