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

    m = crop_bbox_mask(geom, center_tl, bbox_size)
    return cube * m[..., None].astype(cube.dtype)


def crop_axis_masks(
    geom: ProjectionGeometry, center_tl: jnp.ndarray, bbox_size: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-axis factors (mx (vx,), my (vy,), mz (vz,)) of the separable
    crop mask zeroing voxels outside the predicted bbox or the capture
    volume — the same start/end window the reference computes
    (project_individual.py:114-121)."""
    vx, vy, vz = geom.ind_voxels_per_axis
    fine = jnp.asarray(geom.fine_voxels_per_axis, jnp.int32)
    vox = jnp.asarray((vx, vy, vz), jnp.int32)

    fx = center_tl[0] + jnp.arange(vx, dtype=jnp.int32)
    fy = center_tl[1] + jnp.arange(vy, dtype=jnp.int32)
    fz = center_tl[2] + jnp.arange(vz, dtype=jnp.int32)

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

    return axis_mask(fx, 0), axis_mask(fy, 1), axis_mask(fz, 2)


def crop_bbox_mask(
    geom: ProjectionGeometry, center_tl: jnp.ndarray, bbox_size: jnp.ndarray
) -> jnp.ndarray:
    """(vx, vy, vz) bool crop mask (see crop_axis_masks)."""
    mx, my, mz = crop_axis_masks(geom, center_tl, bbox_size)
    return mx[:, None, None] & my[None, :, None] & mz[None, None, :]


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


# ---------------------------------------------------------------------------
# Pallas-kernel fast path (ops/pallas_sampling.py)
# ---------------------------------------------------------------------------


def project_whole_pallas(
    geom: ProjectionGeometry,
    hm_packed: jnp.ndarray,  # (G, V, Hp, Wp*JP)
    cams: jnp.ndarray,  # (V, 21)
    spec,  # SampleKernelSpec with tile dividing the whole grid
) -> jnp.ndarray:
    """Pallas variant of project_whole: the static 80x80x20 world grid is
    stored as a tile-ordered constant; per view it projects, samples via
    the matmul-gather kernel and camera-averages.

    The pixel coordinates are byte-identical to the quad path's
    (project_to_norm_coords, including the [-1.1, 1.1] clamp that also
    bounds behind-camera garbage), and the kernel is exact for any
    coordinates (tiles whose footprint exceeds the anchored window —
    bins near a camera, image-plane-straddling pillars — take the
    in-kernel full-cover path), so this path matches the quad/reference
    output everywhere (reference project_whole.py:49-88)."""
    from ..ops.pallas_sampling import sample_tiles, tile_offsets_np, tiles_to_cube

    vx, vy, vz = geom.voxels_per_axis
    J = spec.num_joints
    offs = tile_offsets_np((vx, vy, vz), spec.tile)  # (N, 3)
    grid = geom.whole_grid.reshape(vx, vy, vz, 3)[
        offs[:, 0], offs[:, 1], offs[:, 2]
    ]  # static numpy fancy-index: tile-ordered world grid constant
    pts = jnp.asarray(grid, jnp.float32)
    rt = jnp.asarray(geom.resize_transform, jnp.float32)
    w, h = geom.heatmap_size
    s = spec.samples
    nb = pts.shape[0] // s

    def per_view(cam):
        norm = project_to_norm_coords(
            pts, cam, rt, geom.ori_image_size, geom.image_size,
            geom.heatmap_size,
        )
        return (norm + 1.0) * 0.5 * jnp.asarray([w - 1, h - 1], jnp.float32)

    pix = jax.vmap(per_view)(cams)  # (V, N, 2)
    blocks = pix.reshape(-1, nb, s, 2).transpose(1, 0, 3, 2)  # (NB, V, 2, S)
    vals = sample_tiles(hm_packed, blocks, spec)  # (NB, JP_TOTAL, S)
    return tiles_to_cube(vals, (vx, vy, vz), spec.tile, J)


def project_whole_batch_pallas(geom, hm_packed, cams, spec):
    """(B, V, H, W*JP), (B, V, 21) -> (B, X, Y, Z, J)."""
    return jax.vmap(
        functools.partial(project_whole_pallas, geom, spec=spec)
    )(hm_packed, cams)


def project_individual_planes_pallas(
    geom: ProjectionGeometry,
    hm_packed: jnp.ndarray,  # (G, V, Hp, Wp*JP) from pack_heatmaps
    cams: jnp.ndarray,  # (V, 21)
    centers_tl: jnp.ndarray,  # (K, 3)
    bbox_sizes: jnp.ndarray,  # (K, 2)
    valid: Optional[jnp.ndarray],  # (K,) bool
    spec,  # ops.pallas_sampling.SampleKernelSpec
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pallas-kernel variant of project_individual_planes: identical
    semantics (crop world coords -> per-view bilinear sample -> camera
    mean -> clamp -> bbox mask -> three orthographic max-projections),
    but the 13.1M samples/frame run as dense MXU/VPU math instead of XLA
    row gathers (~10x, see ops/pallas_sampling.py).

    All K proposal slots go through ONE kernel launch (per-person
    launches cost ~0.6ms each in pipeline warmup); undetected slots are
    skipped inside the kernel via a validity scalar-prefetch, preserving
    the detected-people cost scaling of the reference's valid-only loop.
    The bbox mask and the three max-projections are applied directly in
    tile-blocked layout (the mask is axis-separable), so the 64^3 cubes
    are never materialized in natural order."""
    from ..ops.pallas_sampling import sample_tiles, tile_offsets_np

    vx, vy, vz = geom.ind_voxels_per_axis
    tx, ty, tz = spec.tile
    ntx, nty, ntz = vx // tx, vy // ty, vz // tz
    J = spec.num_joints
    jp = spec.jp_total
    K = centers_tl.shape[0]

    offs = jnp.asarray(
        tile_offsets_np((vx, vy, vz), spec.tile), jnp.int32
    )  # (N, 3) tile-blocked voxel order
    n = offs.shape[0]
    s = spec.samples
    nb = n // s

    # axis-separable bbox mask, shared by dead-tile gating and the
    # epilogue multiply (reference project_individual.py:114-121)
    mx, my, mz = jax.vmap(lambda tl, bb: crop_axis_masks(geom, tl, bb))(
        centers_tl, bbox_sizes
    )  # (K, vx), (K, vy), (K, vz) bool

    # dead-tile gating: every voxel of a tile whose x- or y- or z-slab
    # falls fully outside the bbox is zeroed by the epilogue mask anyway,
    # so such tiles skip sampling entirely (output-identical; typical
    # bboxes kill 55-75% of each 64^3 crop, the dominant JLN cost).
    # Tile order is x-major (tile_offsets_np), matching this reshape.
    lx = mx.reshape(K, ntx, tx).any(-1)
    ly = my.reshape(K, nty, ty).any(-1)
    lz = mz.reshape(K, ntz, tz).any(-1)
    live = (
        lx[:, :, None, None] & ly[:, None, :, None] & lz[:, None, None, :]
    ).reshape(K, nb)
    pvalid = (
        jnp.ones((K, 1), bool) if valid is None else valid[:, None]
    )
    bvalid = (live & pvalid).astype(jnp.int32).reshape(K * nb)

    fine = jnp.asarray(geom.fine_voxels_per_axis, jnp.float32)
    space = jnp.asarray(geom.space_size, jnp.float32)
    space_center = jnp.asarray(geom.space_center, jnp.float32)
    fine_step = space / (fine - 1.0)
    origin = space_center - space / 2.0
    rt = jnp.asarray(geom.resize_transform, jnp.float32)
    w, h = geom.heatmap_size

    fused_fp = None
    if getattr(spec, "fused_coords", False):
        # fused-coords mode: ship only each tile's WORLD origin; the
        # kernel projects per sample on the VPU (sample_tiles_fused) —
        # no (K*nb, V, 2, S) coords tensor, no ~105MB/frame round trip
        from ..ops.pallas_sampling import FusedProj

        # (nb, 3) first-voxel index of each tile — reuse the tile-blocked
        # enumeration already built above instead of re-running the
        # 262k-row meshgrid on the host per trace
        tile_bases = offs[::s].astype(jnp.float32)
        blocks = jax.vmap(
            lambda tl: origin + (tl[None, :].astype(jnp.float32) + tile_bases)
            * fine_step
        )(centers_tl).reshape(K * nb, 3)
        rt_np = np.asarray(geom.resize_transform, np.float64)
        fused_fp = FusedProj(
            step=tuple(float(v) for v in np.asarray(geom.space_size)
                       / (np.asarray(geom.fine_voxels_per_axis) - 1.0)),
            t=tuple(float(v) for v in rt_np.ravel()),
            clip_hi=float(max(geom.ori_image_size)),
            hm_w=float(w), hm_h=float(h),
            img_w=float(geom.image_size[0]),
            img_h=float(geom.image_size[1]),
            wm1=float(w - 1), hm1=float(h - 1),
        )
    else:

        def person_coords(tl):
            pts = origin + (tl[None, :] + offs).astype(jnp.float32) * fine_step

            def per_view(cam):
                norm = project_to_norm_coords(
                    pts, cam, rt, geom.ori_image_size, geom.image_size,
                    geom.heatmap_size,
                )
                # normalized [-1.1, 1.1] -> pixel frame (same clamp
                # semantics as the quad path; out-of-image pixels weight
                # to zero in the kernel's image-clipped windows)
                return (norm + 1.0) * 0.5 * jnp.asarray(
                    [w - 1, h - 1], jnp.float32
                )

            pix = jax.vmap(per_view)(cams)  # (V, N, 2)
            return pix.reshape(-1, nb, s, 2).transpose(1, 0, 3, 2)

        blocks = jax.vmap(person_coords)(centers_tl).reshape(K * nb, -1, 2, s)

    # per-sample bbox mask in tile-blocked order, applied INSIDE the
    # kernel: the old epilogue's three full-cube f32 broadcast multiplies
    # cost ~4ms/frame of HBM traffic at the Panoptic profile.  bf16
    # output (fast mode) halves the cube write + the max-projection reads.
    mask_cube = (
        mx[:, :, None, None] & my[:, None, :, None] & mz[:, None, None, :]
    )  # (K, vx, vy, vz)
    mask_blocked = mask_cube.reshape(
        K, ntx, tx, nty, ty, ntz, tz
    ).transpose(0, 1, 3, 5, 2, 4, 6).reshape(K * nb, s)
    out_dtype = jnp.float32 if spec.exact or not spec.vpu_bf16 else jnp.bfloat16
    pow2 = not any(d & (d - 1) for d in spec.tile)
    if pow2 and s == spec.padded_samples:
        # fast path: the kernel emits per-tile plane partials directly
        # (roll-max + selector compaction) — the 64^3 cubes never touch
        # HBM, and the old strided XLA max reductions (~3.4ms/frame at
        # the Panoptic profile) shrink to small per-axis maxes
        if fused_fp is not None:
            from ..ops.pallas_sampling import sample_tiles_fused

            pxy, pxz, pyz = sample_tiles_fused(
                hm_packed, blocks, cams, fused_fp, spec, valid=bvalid,
                mask=mask_blocked, out_dtype=out_dtype, emit_planes=True,
            )
        else:
            pxy, pxz, pyz = sample_tiles(
                hm_packed, blocks, spec, valid=bvalid, mask=mask_blocked,
                out_dtype=out_dtype, emit_planes=True,
            )

        def finish(p, keep, na, nb_, ta, tb, axis):
            p = p.reshape(K, ntx, nty, ntz, jp, -1)[..., :keep].max(axis=axis)
            p = p.reshape(K, na, nb_, jp, ta, tb).transpose(0, 1, 4, 2, 5, 3)
            return p.reshape(K, na * ta, nb_ * tb, jp)[..., :J]

        plane_xy = finish(pxy, tx * ty, ntx, nty, tx, ty, 3)
        plane_xz = finish(pxz, tx * tz, ntx, ntz, tx, tz, 2)
        plane_yz = finish(pyz, ty * tz, nty, ntz, ty, tz, 1)
        return plane_xy, plane_xz, plane_yz

    if fused_fp is not None:
        from ..ops.pallas_sampling import sample_tiles_fused

        vals = sample_tiles_fused(
            hm_packed, blocks, cams, fused_fp, spec, valid=bvalid,
            mask=mask_blocked, out_dtype=out_dtype,
        )
    else:
        vals = sample_tiles(
            hm_packed, blocks, spec, valid=bvalid, mask=mask_blocked,
            out_dtype=out_dtype,
        )  # (K*nb, JP, S)

    # max-projections in tile-blocked layout (mask already applied)
    v8 = vals.reshape(K, ntx, nty, ntz, jp, tx, ty, tz)

    def plane(maxed, na, nb_, ta, tb):
        # (K, na, nb_, jp, ta, tb) -> (K, na*ta, nb_*tb, J)
        p = maxed.transpose(0, 1, 4, 2, 5, 3)
        return p.reshape(K, na * ta, nb_ * tb, jp)[..., :J]

    plane_xy = plane(jnp.max(v8, axis=(3, 7)), ntx, nty, tx, ty)
    plane_xz = plane(jnp.max(v8, axis=(2, 6)), ntx, ntz, tx, tz)
    plane_yz = plane(jnp.max(v8, axis=(1, 5)), nty, ntz, ty, tz)
    return plane_xy, plane_xz, plane_yz
