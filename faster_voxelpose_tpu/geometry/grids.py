"""Voxel-grid geometry: world-coordinate grids and the world->normalized
heatmap-coordinate mapping shared by the whole-space and per-person
projection stages.

The reference computes these per sequence at runtime and caches them in
module dicts (project_whole.py:75-82, project_individual.py:82-94).  Here
they are pure functions: static grids are host-side numpy constants baked
into the jit graph; the per-camera projection happens on device, fused,
with no cache and no string-keyed state.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .cameras import project_points


def compute_grid_np(
    box_size: Tuple[float, float, float],
    box_center: Tuple[float, float, float],
    n_bins: Tuple[int, int, int],
) -> np.ndarray:
    """World coordinates of an axis-aligned voxel grid, (Nx*Ny*Nz, 3),
    x-major flattening (reference project_whole.compute_grid,
    project_whole.py:28-47)."""
    gx = np.linspace(-box_size[0] / 2, box_size[0] / 2, n_bins[0]) + box_center[0]
    gy = np.linspace(-box_size[1] / 2, box_size[1] / 2, n_bins[1]) + box_center[1]
    gz = np.linspace(-box_size[2] / 2, box_size[2] / 2, n_bins[2]) + box_center[2]
    mx, my, mz = np.meshgrid(gx, gy, gz, indexing="ij")
    return np.stack([mx.ravel(), my.ravel(), mz.ravel()], axis=1)


def compute_center_grids_np(
    ind_space_size: Tuple[float, float, float],
    space_center: Tuple[float, float, float],
    ind_voxels: Tuple[int, int, int],
) -> np.ndarray:
    """The 2D coordinates of the three orthogonal planes (xy, xz, yz) of a
    person box, used by soft-argmax decoding
    (reference project_individual.save_grid, project_individual.py:35-42).

    Returns (3, P, 2) with P = vox*vox, row-major over (axis0, axis1).
    """
    vx, vy, vz = ind_voxels
    grid = compute_grid_np(ind_space_size, space_center, ind_voxels).reshape(
        vx, vy, vz, 3
    )
    plane_xy = grid[:, :, 0, :2].reshape(-1, 2)  # (x, y) at z-slice 0
    plane_xz = grid[:, 0, :, ::2].reshape(-1, 2)  # (x, z) at y-slice 0
    plane_yz = grid[0, :, :, 1:].reshape(-1, 2)  # (y, z) at x-slice 0
    return np.stack([plane_xy, plane_xz, plane_yz], axis=0)


def project_to_norm_coords(
    world_pts: jnp.ndarray,
    packed_cam: jnp.ndarray,
    resize_transform: jnp.ndarray,
    ori_image_size: Tuple[int, int],
    image_size: Tuple[int, int],
    heatmap_size: Tuple[int, int],
) -> jnp.ndarray:
    """World (N,3) -> normalized heatmap sampling coords (N,2) in [-1.1,1.1].

    Pipeline identical to reference project_grid (project_whole.py:49-60):
    pinhole+distortion projection, clamp to [-1, max(ori_wh)], the
    original->input resize affine, input->heatmap rescale, and the
    align_corners=True normalization with the final [-1.1, 1.1] clamp that
    bounds how far out-of-image samples can wander.
    """
    xy = project_points(world_pts, packed_cam)
    xy = jnp.clip(xy, -1.0, float(max(ori_image_size[0], ori_image_size[1])))
    # 2x3 affine as explicit f32 multiply-adds (avoids XLA default matmul
    # precision; see geometry/cameras.py:project_points)
    t = resize_transform
    xy = jnp.stack(
        [
            xy[:, 0] * t[0, 0] + xy[:, 1] * t[0, 1] + t[0, 2],
            xy[:, 0] * t[1, 0] + xy[:, 1] * t[1, 1] + t[1, 2],
        ],
        axis=-1,
    )
    w, h = heatmap_size
    xy = xy * jnp.asarray([w, h], dtype=xy.dtype) / jnp.asarray(
        image_size, dtype=xy.dtype
    )
    norm = xy / jnp.asarray([w - 1, h - 1], dtype=xy.dtype) * 2.0 - 1.0
    return jnp.clip(norm, -1.1, 1.1)
