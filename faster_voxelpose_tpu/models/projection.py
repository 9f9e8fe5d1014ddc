"""Multi-view heatmap back-projection into voxel feature volumes.

This is the TPU-first re-design of the reference's two ProjectLayers
(lib/models/project_whole.py, lib/models/project_individual.py).  The
reference caches per-sequence projected sample grids in module dicts keyed
by sequence-name strings and loops over batch items / people in Python.
Here both stages are pure fixed-shape functions of
  (heatmaps, packed camera rigs, static geometry constants)
vmapped over batch, views and people:

* whole-space stage: the 80x80x20 world grid is a static constant baked
  into the jit graph; its projection into every camera (B*V*128k pinhole+
  distortion evaluations) is recomputed on device each call — cheaper than
  a cache lookup would be, and it removes all string-keyed state.

* per-person stage: the reference materializes a 253x253x64 (Campus:
  379x379x64) "fine grid" sample table per sequence (~10^7 coords x views,
  hundreds of MB) and slices 64^3 windows out of it.  We never build that
  table: each person's 64^3 crop world-coordinates are reconstructed
  arithmetically from the integer crop origin (`centers_tl`) and projected
  on the fly inside the same fused kernel that samples the heatmaps.
  FLOPs are trivial (VPU), HBM traffic drops by the size of the table, and
  every person/batch slot is processed by the same static-shape program
  (compute-all-and-mask replaces the reference's data-dependent `continue`,
  project_individual.py:124-126).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..geometry.grids import (
    compute_center_grids_np,
    compute_grid_np,
    project_to_norm_coords,
)
from ..ops.sampling import sample_and_mean_views_quad


class ProjectionGeometry(NamedTuple):
    """Static geometry constants derived from a Config: everything a
    projection call needs besides heatmaps + cameras.  All entries are
    numpy/python constants — they become jit-time literals."""

    # image/heatmap frames
    ori_image_size: Tuple[int, int]
    image_size: Tuple[int, int]
    heatmap_size: Tuple[int, int]
    resize_transform: np.ndarray  # (2, 3)
    # whole space
    space_size: Tuple[float, float, float]
    space_center: Tuple[float, float, float]
    voxels_per_axis: Tuple[int, int, int]
    whole_grid: np.ndarray  # (Nbins, 3) world coords
    # individual space
    ind_space_size: Tuple[float, float, float]
    ind_voxels_per_axis: Tuple[int, int, int]
    fine_voxels_per_axis: Tuple[int, int, int]
    center_grids: np.ndarray  # (3, P, 2) soft-argmax plane coords
    # crop-origin affine: tl = round(center * scale + bias)
    fine_scale: np.ndarray  # (3,)
    fine_bias: np.ndarray  # (3,)


def make_projection_geometry(cfg: Config) -> ProjectionGeometry:
    from ..geometry.transforms import get_resize_transform

    cs, ind = cfg.CAPTURE_SPEC, cfg.INDIVIDUAL_SPEC
    fine = cfg.fine_voxels_per_axis
    whole_grid = compute_grid_np(cs.SPACE_SIZE, cs.SPACE_CENTER, cs.VOXELS_PER_AXIS)
    center_grids = compute_center_grids_np(
        ind.SPACE_SIZE, cs.SPACE_CENTER, ind.VOXELS_PER_AXIS
    )
    # crop-origin mapping (reference project_individual.py:28-30):
    # scale = (fine-1)/whole_size;
    # bias  = -ind_size/2/whole_size*(fine-1) - scale*(center - whole_size/2)
    space = np.asarray(cs.SPACE_SIZE)
    center = np.asarray(cs.SPACE_CENTER)
    ind_size = np.asarray(ind.SPACE_SIZE)
    fine_arr = np.asarray(fine, dtype=np.float64)
    scale = (fine_arr - 1) / space
    bias = -ind_size / 2.0 / space * (fine_arr - 1) - scale * (center - space / 2.0)

    return ProjectionGeometry(
        ori_image_size=cfg.DATASET.ORI_IMAGE_SIZE,
        image_size=cfg.DATASET.IMAGE_SIZE,
        heatmap_size=cfg.DATASET.HEATMAP_SIZE,
        resize_transform=get_resize_transform(
            cfg.DATASET.ORI_IMAGE_SIZE, cfg.DATASET.IMAGE_SIZE
        ),
        space_size=cs.SPACE_SIZE,
        space_center=cs.SPACE_CENTER,
        voxels_per_axis=cs.VOXELS_PER_AXIS,
        whole_grid=whole_grid.astype(np.float32),
        ind_space_size=ind.SPACE_SIZE,
        ind_voxels_per_axis=ind.VOXELS_PER_AXIS,
        fine_voxels_per_axis=fine,
        center_grids=center_grids.astype(np.float32),
        fine_scale=scale.astype(np.float32),
        fine_bias=bias.astype(np.float32),
    )


# ---------------------------------------------------------------------------
# whole-space projection (HDN input volume)
# ---------------------------------------------------------------------------


def project_whole(
    geom: ProjectionGeometry,
    quads: jnp.ndarray,  # (V, H*W, 4, J) quad tables (ops/sampling.py)
    cams: jnp.ndarray,  # (V, 21)
) -> jnp.ndarray:
    """One sample's whole-space voxel feature cube (X, Y, Z, J):
    project the static world grid into every view, bilinearly sample each
    view's heatmaps (one fast-path row gather per sample via the quad
    table), average over views, clamp to [0,1]
    (reference project_whole.forward, project_whole.py:62-88)."""
    grid = jnp.asarray(geom.whole_grid)  # (N, 3)
    rt = jnp.asarray(geom.resize_transform, jnp.float32)
    w, h = geom.heatmap_size

    def per_view(cam):
        return project_to_norm_coords(
            grid, cam, rt, geom.ori_image_size, geom.image_size, geom.heatmap_size
        )

    coords = jax.vmap(per_view)(cams)  # (V, N, 2)
    vals = sample_and_mean_views_quad(quads, coords, h, w)  # (N, J)
    vx, vy, vz = geom.voxels_per_axis
    return vals.reshape(vx, vy, vz, -1)


def project_whole_batch(geom, quads, cams):
    """(B, V, H*W, 4, J), (B, V, 21) -> (B, X, Y, Z, J)."""
    return jax.vmap(functools.partial(project_whole, geom))(quads, cams)


# ---------------------------------------------------------------------------
# per-person fine crop (JLN input volumes)
# ---------------------------------------------------------------------------


def compute_crop_origin(
    geom: ProjectionGeometry, centers_mm: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integer crop origin on the virtual fine grid + millimeter offset of
    the crop for soft-argmax decoding
    (reference project_individual.py:110-111)."""
    scale = jnp.asarray(geom.fine_scale)
    bias = jnp.asarray(geom.fine_bias)
    fine = jnp.asarray(geom.fine_voxels_per_axis, jnp.float32)
    space = jnp.asarray(geom.space_size, jnp.float32)
    ind = jnp.asarray(geom.ind_space_size, jnp.float32)

    tl = jnp.round(centers_mm * scale + bias).astype(jnp.int32)  # (..., 3)
    offset = tl.astype(jnp.float32) / (fine - 1) * space - space / 2.0 + ind / 2.0
    return tl, offset


def project_individual(
    geom: ProjectionGeometry,
    quads: jnp.ndarray,  # (V, H*W, 4, J) quad tables
    cams: jnp.ndarray,  # (V, 21)
    center_tl: jnp.ndarray,  # (3,) int32 crop origin on the fine grid
    bbox_size: jnp.ndarray,  # (2,) normalized xy bbox size
) -> jnp.ndarray:
    """One person's fine feature cube (64, 64, 64, J).

    The crop's world coordinates are reconstructed from the fine-grid
    arithmetic (identical values to slicing the reference's cached fine
    grid, project_individual.py:41,128) and projected per view on the fly.
    Voxels outside the predicted bbox or outside the capture volume are
    zeroed via the same start/end window the reference computes
    (project_individual.py:114-121), expressed as an elementwise mask.
    """
    vx, vy, vz = geom.ind_voxels_per_axis
    fine = jnp.asarray(geom.fine_voxels_per_axis, jnp.int32)
    space = jnp.asarray(geom.space_size, jnp.float32)
    space_center = jnp.asarray(geom.space_center, jnp.float32)
    vox = jnp.asarray((vx, vy, vz), jnp.int32)

    # world coords of crop voxels: fine index i -> center - S/2 + i*S/(F-1)
    fine_step = space / (fine.astype(jnp.float32) - 1.0)
    origin = space_center - space / 2.0

    ax = jnp.arange(vx, dtype=jnp.int32)
    ay = jnp.arange(vy, dtype=jnp.int32)
    az = jnp.arange(vz, dtype=jnp.int32)
    fx = center_tl[0] + ax  # fine-grid indices per axis
    fy = center_tl[1] + ay
    fz = center_tl[2] + az
    wx = origin[0] + fx.astype(jnp.float32) * fine_step[0]
    wy = origin[1] + fy.astype(jnp.float32) * fine_step[1]
    wz = origin[2] + fz.astype(jnp.float32) * fine_step[2]

    pts = jnp.stack(
        [
            jnp.broadcast_to(wx[:, None, None], (vx, vy, vz)),
            jnp.broadcast_to(wy[None, :, None], (vx, vy, vz)),
            jnp.broadcast_to(wz[None, None, :], (vx, vy, vz)),
        ],
        axis=-1,
    ).reshape(-1, 3)

    rt = jnp.asarray(geom.resize_transform, jnp.float32)

    def per_view(cam):
        return project_to_norm_coords(
            pts, cam, rt, geom.ori_image_size, geom.image_size, geom.heatmap_size
        )

    coords = jax.vmap(per_view)(cams)  # (V, N, 2)
    w, h = geom.heatmap_size
    vals = sample_and_mean_views_quad(quads, coords, h, w)  # (N, J)
    cube = vals.reshape(vx, vy, vz, -1)

    # bbox mask margin per xy axis (z margin fixed 0): reference
    # project_individual.py:114-117
    margin_xy = ((1.0 - bbox_size) / 2.0 * (vox[:2].astype(jnp.float32) - 1)).astype(
        jnp.int32
    )
    margin = jnp.concatenate([jnp.maximum(margin_xy, 0), jnp.zeros((1,), jnp.int32)])

    start = jnp.maximum(center_tl + margin, 0)  # inclusive, fine-grid frame
    end = jnp.minimum(center_tl + vox - margin, fine)  # exclusive

    def axis_mask(f_idx, a):
        return (f_idx >= start[a]) & (f_idx < end[a])

    m = (
        axis_mask(fx, 0)[:, None, None]
        & axis_mask(fy, 1)[None, :, None]
        & axis_mask(fz, 2)[None, None, :]
    )
    return cube * m[..., None].astype(cube.dtype)


def project_individual_people(
    geom: ProjectionGeometry,
    quads: jnp.ndarray,  # (V, H*W, 4, J)
    cams: jnp.ndarray,  # (V, 21)
    centers_tl: jnp.ndarray,  # (K, 3)
    bbox_sizes: jnp.ndarray,  # (K, 2)
) -> jnp.ndarray:
    """All proposal slots of one sample: (K, 64, 64, 64, J)."""
    return jax.vmap(lambda tl, bb: project_individual(geom, quads, cams, tl, bb))(
        centers_tl, bbox_sizes
    )


def project_individual_planes(
    geom: ProjectionGeometry,
    quads: jnp.ndarray,  # (V, H*W, 4, J) quad tables
    cams: jnp.ndarray,  # (V, 21)
    centers_tl: jnp.ndarray,  # (K, 3)
    bbox_sizes: jnp.ndarray,  # (K, 2)
    valid: Optional[jnp.ndarray] = None,  # (K,) bool; invalid slots skipped
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-person orthographic plane projections, memory-bounded.

    Fuses the crop-sample with the xy/xz/yz max-projections
    (joint_localization_net.py:80-81) inside a sequential lax.map over
    people, so one person's 64^3 cube and its multi-view gather
    intermediates are live at a time (vmapping all K people at once peaks
    at >10GB of gather temporaries on the full Panoptic config — past a
    v5e's 16GB HBM once the backbone activations join).

    Invalid proposal slots take a lax.cond fast path producing zero planes
    — the cost of the JLN sampling then scales with the number of DETECTED
    people, like the reference's valid-only loop
    (joint_localization_net.py:77), instead of always paying MAX_PEOPLE.
    (Downstream outputs for invalid slots are masked to zero regardless,
    so this is behaviour-preserving; in train mode it changes what the
    plane U-Net's BatchNorm batch statistics see for dead slots — zeros
    instead of garbage crops — see docs/DESIGN.md.)

    Returns (plane_xy (K,X,Y,J), plane_xz (K,X,Z,J), plane_yz (K,Y,Z,J)).
    """
    vx, vy, vz = geom.ind_voxels_per_axis
    J = quads.shape[-1]
    if valid is None:
        valid = jnp.ones(centers_tl.shape[0], bool)

    def compute(args):
        tl, bb, _ = args
        cube = project_individual(geom, quads, cams, tl, bb)
        return (
            jnp.max(cube, axis=2),
            jnp.max(cube, axis=1),
            jnp.max(cube, axis=0),
        )

    def skip(args):
        return (
            jnp.zeros((vx, vy, J), jnp.float32),
            jnp.zeros((vx, vz, J), jnp.float32),
            jnp.zeros((vy, vz, J), jnp.float32),
        )

    def body(args):
        return jax.lax.cond(args[2], compute, skip, args)

    return jax.lax.map(body, (centers_tl, bbox_sizes, valid))
