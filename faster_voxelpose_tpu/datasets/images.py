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

    from ..native.build import load_warp_lib

    W, H = int(image_size[0]), int(image_size[1])
    native = load_warp_lib() is not None
    views = []
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
        if img is None:
            raise FileNotFoundError(p)
        needs_warp = img.shape[1] != W or img.shape[0] != H
        if needs_warp and resize_transform is None:
            raise ValueError(
                f"image {p} is {img.shape[1]}x{img.shape[0]}, expected "
                f"{W}x{H}; pass resize_transform for on-the-fly warping"
            )
        if native:
            views.append(
                preprocess_view_native(img, (W, H), resize_transform, color_rgb)
            )
            continue
        if color_rgb:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if needs_warp:
            img = cv2.warpAffine(
                img, resize_transform.astype(np.float32), (W, H), flags=cv2.INTER_LINEAR
            )
        views.append(normalize_image(img))
    return np.stack(views, axis=0)


def load_view_images_u8(
    paths: List[str],
    image_size,
    resize_transform: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Decode + (maybe) warp only: (V, H, W, 3) uint8, BGR as decoded.

    The transfer-optimal variant of load_view_images for consumers whose
    device graph normalizes on-chip (normalize_images_device): the host
    ships 4x fewer bytes (uint8 vs float32) and skips the normalize pass
    entirely -- XLA fuses the u8->f32 convert + channel swap + affine
    into the backbone stem's input.
    """
    import cv2

    W, H = int(image_size[0]), int(image_size[1])
    views = []
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
        if img is None:
            raise FileNotFoundError(p)
        if img.shape[1] != W or img.shape[0] != H:
            if resize_transform is None:
                raise ValueError(
                    f"image {p} is {img.shape[1]}x{img.shape[0]}, expected "
                    f"{W}x{H}; pass resize_transform for on-the-fly warping"
                )
            img = cv2.warpAffine(
                img, resize_transform.astype(np.float32), (W, H),
                flags=cv2.INTER_LINEAR,
            )
        views.append(np.ascontiguousarray(img))
    return np.stack(views, axis=0)


def normalize_images_device(images, color_rgb: bool = True):
    """On-device analogue of the host normalize: uint8 (..., 3) BGR (as
    decoded) -> ImageNet-normalized float32, channels reversed to RGB
    when color_rgb.  Pure jnp elementwise math -- XLA fuses it into the
    consuming backbone stem, so device-side normalization is free and
    the host->device payload stays uint8."""
    import jax.numpy as jnp

    if color_rgb:
        images = images[..., ::-1]
    x = images.astype(jnp.float32) * (1.0 / 255.0)
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def preprocess_view_native(
    img: np.ndarray,  # decoded uint8 HWC (BGR as from cv2.imread)
    image_size,  # (W, H)
    resize_transform: Optional[np.ndarray],
    color_rgb: bool,
) -> np.ndarray:
    """Native-accelerated preprocessing of a decoded frame.

    The warp itself runs through cv2's SIMD fixed-point warpAffine (its
    ~5ms at 1080p->960x512 is 2x our scalar C++ loop) directly on the
    BGR frame -- bilinear warping commutes with the channel swap -- and
    the normalize+swap runs fused in native code (normalize_u8, ~1ms vs
    ~9ms for the numpy chain's three full-image passes).  End to end at
    a 1080p Panoptic frame: 13.9ms python chain -> 6.25ms (2.2x).
    warp_normalize_native (the fully fused single-pass kernel) remains
    for cv2-free callers feeding raw arrays.
    """
    import cv2

    from ..native.build import normalize_u8_native

    W, H = int(image_size[0]), int(image_size[1])
    if img.shape[1] != W or img.shape[0] != H:
        img = cv2.warpAffine(
            img, resize_transform.astype(np.float32), (W, H), flags=cv2.INTER_LINEAR
        )
    return normalize_u8_native(img, IMAGENET_MEAN, IMAGENET_STD, color_rgb)


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 HWC RGB -> float32 HWC, ImageNet-normalized."""
    return (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_images(imgs: np.ndarray) -> np.ndarray:
    """Invert normalize_image for visualization: float32 (..., H, W, 3)
    -> uint8 HWC frames."""
    out = (imgs * IMAGENET_STD + IMAGENET_MEAN) * 255.0
    return np.clip(out, 0, 255).astype(np.uint8)
