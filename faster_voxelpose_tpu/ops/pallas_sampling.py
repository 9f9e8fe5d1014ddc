"""Pallas TPU kernel for multi-view bilinear heatmap sampling.

This replaces the XLA gather fast-path (ops/sampling.py quad tables) on
the JLN hot loop.  The XLA gather engine issues ~1 row gather / 10ns, so
the 13.1M samples/frame of the Panoptic-profile JLN cost 145ms with the
MXU idle (docs/DESIGN.md).  This kernel reformulates the gather as dense
math with NO per-element gathers:

* crop voxels are processed in TILES (e.g. 4x4x8 voxels = 128 samples)
  whose image footprint is a compact window — voxel neighborhoods project
  to pixel neighborhoods;
* per (tile, view), a window of the heatmap is dynamically sliced from a
  VMEM-resident packed copy (lane layout x-major joint-minor, so slice
  offsets are provably 128-aligned);
* the y interpolation is ONE MXU matmul: a dense (YW, S) distance-weight
  matrix  wy[yi, s] = max(0, 1 - |y_s - yi|)  contracted against the
  window — K-dim padding makes a tall y window nearly free;
* the x interpolation is a lane-parallel VPU contraction over the narrow
  x window;
* the camera mean + clamp is accumulated across views in-registers.

Distance-form weights over an image-clipped window reproduce
grid_sample(align_corners=True, padding_mode='zeros') exactly: out-of-
image corners fall outside every window and contribute zero, in-image
corners within distance 1 get their bilinear weight (bit-checked against
torch semantics in tests/test_pallas_sampling.py and on-chip by
scripts/probe_pallas.py: max err 2.4e-7 at HIGHEST precision).

Precision: Mosaic supports DEFAULT (bf16 MXU passes, ~1.8e-3 abs error,
1.08 ns/sample measured on v5e) and HIGHEST (f32-exact, 3.3 ns/sample).
DEFAULT's error is below the production conv stack's own bf16 compute
noise; parity tests pin exact=True.

Reference behaviour replaced: lib/models/project_individual.py:124-131
(per-person grid_sample loop).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class SampleKernelSpec:
    """Static shape/tuning parameters of one kernel instantiation."""

    n_views: int
    height: int  # heatmap H
    width: int  # heatmap W
    num_joints: int
    tile: Tuple[int, int, int] = (4, 4, 8)  # voxels per block (x, y, z)
    window_x: int = 24  # x window (VPU contraction; multiple of 8)
    window_y: int = 40  # y window (MXU contraction; multiple of 8)
    exact: bool = False  # True: f32-exact MXU passes (HIGHEST)
    interpret: bool = False  # CPU interpreter (tests)
    # bf16 VPU stage-2 (x interpolation): halves the dominant elementwise
    # cost where the VPU packs bf16; numerically moot when exact=False
    # (the MXU stage already rounds to bf16 products)
    vpu_bf16: bool = False
    # window anchoring: 'min' anchors at the tile's minimum coordinate
    # (right for compact crop tiles); 'center' centers the window on the
    # tile's middle sample — robust when a tile mixes in-front samples
    # with behind-camera garbage whose clamped coords would otherwise
    # drag a min-anchored window away from the real cluster (whole-space
    # pillars)
    anchor: str = "min"

    @property
    def jp(self) -> int:
        # lane packing: slice offsets are ox*jp with ox a multiple of 8,
        # so jp must be a multiple of 16 for provable 128-alignment
        return _round_up(self.num_joints, 16)

    @property
    def samples(self) -> int:
        tx, ty, tz = self.tile
        return tx * ty * tz

    @property
    def padded_samples(self) -> int:
        # Mosaic requires 128-aligned slice shapes on the lane (sample)
        # dim; non-aligned tiles get edge-padded coords and a sliced output
        return _round_up(self.samples, 128)

    @property
    def xw(self) -> int:
        return min(self.window_x, _round_up(self.width, 8))

    @property
    def yw(self) -> int:
        return min(self.window_y, _round_up(self.height, 8))

    def validate(self):
        if self.xw % 8 or self.yw % 8:
            raise ValueError("windows must be multiples of 8")
        if self.anchor not in ("min", "center"):
            raise ValueError(f"unknown anchor mode {self.anchor!r}")


def pack_heatmaps(heatmaps: jnp.ndarray, spec: SampleKernelSpec) -> jnp.ndarray:
    """(V, H, W, J) -> (V, H, W*JP) f32, lane layout x-major joint-minor.

    The y axis stays on sublanes (the MXU contraction dim); x and joints
    share lanes so an x window is one aligned contiguous lane slice.
    """
    V, H, W, J = heatmaps.shape
    hmp = jnp.pad(heatmaps.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, spec.jp - J)))
    return hmp.reshape(V, H, W * spec.jp)


def _compute_block(coords_ref, hm_ref, spec: SampleKernelSpec):
    """The sampling math for one block: (V, 2, S) coords against the
    VMEM-resident heatmaps -> (JP, S) camera-averaged clamped samples."""
    s = spec.padded_samples
    xw, yw, jp = spec.xw, spec.yw, spec.jp
    w, h = spec.width, spec.height
    precision = (
        jax.lax.Precision.HIGHEST if spec.exact else jax.lax.Precision.DEFAULT
    )

    acc = jnp.zeros((jp, s), jnp.float32)
    for v in range(spec.n_views):
        x = coords_ref[v, 0, :]
        y = coords_ref[v, 1, :]
        # window origin (quantized down to 8 for slice alignment, clipped
        # into the image).  Coverage guarantee: every in-image pixel
        # within distance 1 of any sample must fall in the window, i.e.
        # per-tile pixel spread <= window - 9 (see tile_pixel_spread)
        if spec.anchor == "min":
            ax = jnp.floor(jnp.min(x))
            ay = jnp.floor(jnp.min(y))
        else:  # 'center': window centered on the tile's middle sample
            ax = jnp.floor(x[spec.samples // 2]) - (xw // 2 - 8)
            ay = jnp.floor(y[spec.samples // 2]) - (yw // 2 - 8)
        ox = jnp.clip(ax, 0.0, float(w - xw)).astype(jnp.int32)
        oy = jnp.clip(ay, 0.0, float(h - yw)).astype(jnp.int32)
        ox = pl.multiple_of((ox // 8) * 8, 8)
        oy = pl.multiple_of((oy // 8) * 8, 8)

        win = hm_ref[v, pl.ds(oy, yw), pl.ds(pl.multiple_of(ox * jp, 128), xw * jp)]

        xi = jax.lax.broadcasted_iota(jnp.int32, (xw, s), 0).astype(
            jnp.float32
        ) + ox.astype(jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[None, :] - xi))  # (XW, S)
        yi = jax.lax.broadcasted_iota(jnp.int32, (yw, s), 0).astype(
            jnp.float32
        ) + oy.astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[None, :] - yi))  # (YW, S)

        # y interpolation: one MXU contraction over the (tall) y window
        t = jax.lax.dot_general(
            win,
            wy,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (XW*JP, S), rows x-major joint-minor

        # x interpolation: lane-parallel contraction over the narrow window
        if spec.vpu_bf16:
            p3 = t.astype(jnp.bfloat16).reshape(xw, jp, s) * wx.astype(
                jnp.bfloat16
            )[:, None, :]
            acc = acc + jnp.sum(p3, axis=0).astype(jnp.float32)
        else:
            p3 = t.reshape(xw, jp, s) * wx[:, None, :]
            acc = acc + jnp.sum(p3, axis=0)

    return jnp.clip(acc * (1.0 / spec.n_views), 0.0, 1.0)


def _kernel_body(coords_ref, hm_ref, out_ref, *, spec: SampleKernelSpec):
    out_ref[0] = _compute_block(coords_ref.at[0], hm_ref, spec)


def _kernel_body_valid(valid_ref, coords_ref, hm_ref, out_ref, *, spec):
    """Validity-gated body: invalid blocks (undetected proposal slots)
    write zeros and skip all sampling math, so JLN cost scales with the
    number of DETECTED people like the reference's valid-only loop
    (joint_localization_net.py:77)."""
    i = pl.program_id(0)

    @pl.when(valid_ref[i] > 0)
    def _():
        out_ref[0] = _compute_block(coords_ref.at[0], hm_ref, spec)

    @pl.when(valid_ref[i] <= 0)
    def _():
        out_ref[0] = jnp.zeros((spec.jp, spec.padded_samples), jnp.float32)


def sample_tiles(
    hm_packed: jnp.ndarray,  # (V, H, W*JP)
    coords: jnp.ndarray,  # (NB, V, 2, S) pixel coords
    spec: SampleKernelSpec,
    valid: jnp.ndarray = None,  # (NB,) int32; 0 = skip block, write zeros
) -> jnp.ndarray:  # (NB, JP, S)
    """Camera-averaged bilinear samples for NB tiles of S samples each."""
    spec.validate()
    nb, V, _, s_in = coords.shape
    s = spec.padded_samples
    if s_in != s:
        # lane alignment: replicate the last sample into the pad columns
        # (keeps window bounds untouched); output is sliced back below
        coords = jnp.concatenate(
            [coords, jnp.repeat(coords[..., -1:], s - s_in, axis=-1)], axis=-1
        )
    out_shape = jax.ShapeDtypeStruct((nb, spec.jp, s), jnp.float32)
    if valid is None:
        kern = functools.partial(_kernel_body, spec=spec)
        out = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (1, V, 2, s), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # heatmaps resident
            ],
            out_specs=pl.BlockSpec(
                (1, spec.jp, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=out_shape,
            interpret=spec.interpret,
        )(coords, hm_packed)
    else:
        kern = functools.partial(_kernel_body_valid, spec=spec)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (1, V, 2, s), lambda i, _v: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, spec.jp, s), lambda i, _v: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=spec.interpret,
        )(valid.astype(jnp.int32), coords, hm_packed)
    return out[:, :, :s_in] if s_in != s else out


# ---------------------------------------------------------------------------
# tile ordering: cube <-> tile-blocked sample order
# ---------------------------------------------------------------------------


def tile_offsets_np(
    voxels: Tuple[int, int, int], tile: Tuple[int, int, int]
) -> np.ndarray:
    """Voxel-index offsets (N, 3) int32 of a full cube enumerated in
    tile-blocked order: tiles in x-major order, samples x-major inside
    each tile.  N = prod(voxels); voxels must be divisible by tile."""
    vx, vy, vz = voxels
    tx, ty, tz = tile
    if vx % tx or vy % ty or vz % tz:
        raise ValueError(f"tile {tile} does not divide voxels {voxels}")
    ix, iy, iz = np.meshgrid(
        np.arange(vx), np.arange(vy), np.arange(vz), indexing="ij"
    )
    idx = np.stack([ix, iy, iz], axis=-1).astype(np.int32)  # (vx,vy,vz,3)
    blocked = idx.reshape(
        vx // tx, tx, vy // ty, ty, vz // tz, tz, 3
    ).transpose(0, 2, 4, 1, 3, 5, 6)
    return blocked.reshape(-1, 3)


def tiles_to_cube(
    vals: jnp.ndarray,  # (NB, JP, S)
    voxels: Tuple[int, int, int],
    tile: Tuple[int, int, int],
    num_joints: int,
) -> jnp.ndarray:  # (vx, vy, vz, J)
    """Invert the tile-blocked ordering back to the cube layout (pure
    reshape/transpose: runs at HBM bandwidth, no gathers)."""
    vx, vy, vz = voxels
    tx, ty, tz = tile
    jp = vals.shape[1]
    v6 = vals.transpose(0, 2, 1).reshape(
        vx // tx, vy // ty, vz // tz, tx, ty, tz, jp
    )
    cube = v6.transpose(0, 3, 1, 4, 2, 5, 6).reshape(vx, vy, vz, jp)
    return cube[..., :num_joints]


def tile_pixel_spread(coords: np.ndarray, spec: SampleKernelSpec):
    """Diagnostic: per-tile pixel spread (max-min, both axes) of blocked
    coords (NB, V, 2, S).  The kernel is exact iff
    spread_x <= xw - 9 and spread_y <= yw - 9 for every tile (the -9 is
    bilinear margin 2 + origin quantization 7); tiles near the image edge
    get extra slack from coordinate clamping."""
    spread = coords.max(axis=-1) - coords.min(axis=-1)  # (NB, V, 2)
    return spread[..., 0].max(), spread[..., 1].max()
