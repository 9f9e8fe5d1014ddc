"""Image loading / preprocessing for the backbone ('image' heatmap source).

The reference resizes dataset images on disk once (preprocess.py) and then
applies ToTensor + ImageNet Normalize in DataLoader workers
(run/train.py:60-66).  Here both steps are host-side numpy: an optional
affine warp to the network input size (so raw, un-preprocessed datasets
also work) and channels-last normalization.  Output (V, H, W, 3) float32,
ready for the PoseResNet backbone.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_view_images(
    paths: List[str],
    image_size,
    resize_transform: Optional[np.ndarray] = None,
    color_rgb: bool = True,
) -> np.ndarray:
    """Load + (maybe) warp + normalize a frame's per-view images.

    Args:
      paths: per-view image paths.
      image_size: (W, H) network input size.
      resize_transform: 2x3 original->input affine; applied only when the
        stored image is not already at input size (preprocessed datasets
        skip the warp, matching reference preprocess.py).
    """
    import cv2

    W, H = int(image_size[0]), int(image_size[1])
    views = []
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
        if img is None:
            raise FileNotFoundError(p)
        if color_rgb:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if img.shape[1] != W or img.shape[0] != H:
            if resize_transform is None:
                raise ValueError(
                    f"image {p} is {img.shape[1]}x{img.shape[0]}, expected "
                    f"{W}x{H}; pass resize_transform for on-the-fly warping"
                )
            img = cv2.warpAffine(
                img, resize_transform.astype(np.float32), (W, H), flags=cv2.INTER_LINEAR
            )
        views.append(normalize_image(img))
    return np.stack(views, axis=0)


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 HWC RGB -> float32 HWC, ImageNet-normalized."""
    return (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_images(imgs: np.ndarray) -> np.ndarray:
    """Invert normalize_image for visualization: float32 (..., H, W, 3)
    -> uint8 HWC frames."""
    out = (imgs * IMAGENET_STD + IMAGENET_MEAN) * 255.0
    return np.clip(out, 0, 255).astype(np.uint8)
