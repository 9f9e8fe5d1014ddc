"""Synthetic-but-realistic camera rigs for benchmarks, demos and tests.

The Panoptic-like rig mirrors the real capture geometry (HD cameras on a
~2.5-3.1m dome ring looking at the space center, f~1450px at 1920x1080,
mild radial+tangential distortion).  Benchmarks must use plausible rigs:
the Pallas sampling kernel's window coverage — and any gather locality —
depends on projection geometry, so toy intrinsics would distort the
measurement (reference calibration layout: lib/dataset/panoptic.py:171-205).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def dome_camera(
    idx: int,
    n_views: int,
    space_center: Sequence[float] = (0.0, -500.0, 800.0),
    ori_image_size: Tuple[int, int] = (1920, 1080),
    focal: float = 1450.0,
    radius_range: Tuple[float, float] = (2500.0, 3100.0),
    height_range: Tuple[float, float] = (1200.0, 2400.0),
    seed: int = 100,
) -> dict:
    rng = np.random.RandomState(seed + idx)
    center = np.asarray(space_center, np.float64)
    angle = 2 * np.pi * idx / n_views + rng.uniform(-0.2, 0.2)
    radius = rng.uniform(*radius_range)
    height = rng.uniform(*height_range)
    pos = center + np.array(
        [radius * np.cos(angle), radius * np.sin(angle), height - center[2]]
    )

    fwd = center - pos
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, -1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)  # world->cam rows

    w, h = ori_image_size
    return {
        "R": R,
        "T": pos.reshape(3, 1),
        "fx": focal + rng.uniform(-80, 80),
        "fy": focal + rng.uniform(-80, 80),
        "cx": w / 2.0 + rng.uniform(-30, 30),
        "cy": h / 2.0 + rng.uniform(-30, 30),
        "k": np.array([[-0.12], [0.05], [0.001]]),
        "p": np.array([[8e-4], [-5e-4]]),
    }


def dome_rig(
    B: int,
    n_views: int,
    **kwargs,
) -> np.ndarray:
    """Packed (B, V, 21) f32 rig of dome cameras (see dome_camera)."""
    from .cameras import pack_rig

    cams = [dome_camera(i, n_views, **kwargs) for i in range(n_views)]
    rig = pack_rig(cams).astype(np.float32)
    return np.broadcast_to(rig, (B, n_views, 21)).copy()


def perimeter_camera(
    idx: int,
    n_views: int,
    space_center: Sequence[float] = (3000.0, 4500.0, 1000.0),
    ori_image_size: Tuple[int, int] = (360, 288),
    focal: float = 430.0,
    radius_range: Tuple[float, float] = (8500.0, 12000.0),
    height_range: Tuple[float, float] = (2000.0, 3600.0),
    seed: int = 200,
) -> dict:
    """Campus-like wide-baseline outdoor camera: few views far outside a
    large (12x12m) capture area, low-resolution sensor, long working
    distance (reference Campus rig: 3 cameras, 360x288 images,
    calibration_campus.json; lib/dataset/campus.py:55-70).  Geometry
    matters to the sampling kernel: at this distance a voxel tile's image
    footprint is SMALL, which is the easy regime, but the 12m space also
    projects people near the image border where window clipping paths
    get exercised."""
    rng = np.random.RandomState(seed + idx)
    center = np.asarray(space_center, np.float64)
    angle = 2 * np.pi * idx / n_views + rng.uniform(-0.3, 0.3)
    radius = rng.uniform(*radius_range)
    height = rng.uniform(*height_range)
    pos = center + np.array(
        [radius * np.cos(angle), radius * np.sin(angle), height - center[2]]
    )

    fwd = center - pos
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, -1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)

    w, h = ori_image_size
    return {
        "R": R,
        "T": pos.reshape(3, 1),
        "fx": focal + rng.uniform(-25, 25),
        "fy": focal + rng.uniform(-25, 25),
        "cx": w / 2.0 + rng.uniform(-10, 10),
        "cy": h / 2.0 + rng.uniform(-10, 10),
        "k": np.array([[-0.3], [0.12], [0.0]]),
        "p": np.array([[1e-3], [-1e-3]]),
    }


def perimeter_rig(B: int, n_views: int, **kwargs) -> np.ndarray:
    """Packed (B, V, 21) f32 rig of Campus-like perimeter cameras."""
    from .cameras import pack_rig

    cams = [perimeter_camera(i, n_views, **kwargs) for i in range(n_views)]
    rig = pack_rig(cams).astype(np.float32)
    return np.broadcast_to(rig, (B, n_views, 21)).copy()
