"""Pallas TPU kernel for multi-view bilinear heatmap sampling.

This replaces the XLA gather fast-path (ops/sampling.py quad tables) on
the projection hot loops.  The XLA gather engine issues ~1 row gather /
10ns, so the 13.1M samples/frame of the Panoptic-profile JLN cost 145ms
with the MXU idle (docs/DESIGN.md).  This kernel reformulates the gather
as dense math with NO per-element gathers:

* sample points are processed in TILES (e.g. 8x8x8 voxels = 512 samples)
  whose image footprint is a compact window — voxel neighborhoods project
  to pixel neighborhoods;
* per (tile, view), a window of the heatmap is dynamically sliced from a
  VMEM-resident packed copy (lane layout x-major joint-minor, so slice
  offsets are provably 128-aligned);
* the y interpolation is ONE MXU matmul: a dense (YW, S) distance-weight
  matrix  wy[yi, s] = max(0, 1 - |y_s - yi|)  contracted against the
  window — K-dim padding makes a tall y window nearly free;
* the x interpolation multiplies the narrow x window by per-sample
  weights on the VPU and reduces over x with a second MXU matmul against
  a constant 0/1 joint-selector matrix (the adds ride the MXU, only the
  multiplies stay on the VPU);
* the camera mean + clamp is accumulated across views into the output.

EXACTNESS (round 3): distance-form weights over an image-clipped window
reproduce grid_sample(align_corners=True, padding_mode='zeros') exactly
for every sample whose in-image pixel support lies inside the window.
Each (tile, view) checks that condition IN-KERNEL against its anchored
window; tiles that fail (bins close to a camera, behind-camera garbage
coordinates that land in-image) take a slow path that accumulates over a
static set of disjoint windows tiling the full padded image, with
coverage masks zeroing the overlap of the final window.  Every pixel of
the image is therefore weighted exactly once for every sample, for ANY
coordinates — the kernel is exact everywhere, at fast-path cost for the
overwhelmingly common compact tiles.  (Out-of-image support contributes
zero through the weights and the zero-padded H/W margins, which is
precisely torch zeros-padding semantics — bit-checked against torch in
tests/test_pallas_sampling.py.)

JOINT CAPACITY: lane packing requires the per-call joint dimension to be
a multiple of 16 (slice alignment), so heatmaps are packed into GROUPS of
16 joints and the kernel runs once per group (COCO-17 => 2 groups).  Each
group's packed heatmaps must individually fit VMEM; the VMEM bound is
thus independent of the joint count.

Precision: Mosaic supports DEFAULT (bf16 MXU passes, ~1.8e-3 abs error)
and HIGHEST (f32-exact) — exact=True pins HIGHEST + f32 VPU math and is
what parity tests use.

Reference behaviour replaced: lib/models/project_individual.py:124-131
(per-person grid_sample loop) and lib/models/project_whole.py:71-88
(whole-space grid_sample loop).
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
    height: int  # heatmap H (true, un-padded)
    width: int  # heatmap W (true, un-padded)
    num_joints: int  # total joints J (any count; packed in groups of 16)
    tile: Tuple[int, int, int] = (8, 8, 8)  # voxels per block (x, y, z)
    window_x: int = 40  # x window (VPU/selector-MXU stage; multiple of 8)
    window_y: int = 48  # y window (MXU contraction; multiple of 8)
    exact: bool = False  # True: f32-exact MXU passes (HIGHEST)
    interpret: bool = False  # CPU interpreter (tests)
    # bf16 VPU stage-2 (x interpolation): halves the dominant elementwise
    # cost where the VPU packs bf16; only honored when exact=False (the
    # MXU stage already rounds to bf16 products there)
    vpu_bf16: bool = True
    # compute voxel->pixel projection in-kernel from tile origins + the
    # camera rig (sample_tiles_fused) instead of consuming an XLA coords
    # pass; window flags from corner-interval bounds.  Exact-everywhere
    # either way; requires power-of-two tile dims.
    fused_coords: bool = False

    # ---- derived static shapes ----------------------------------------
    @property
    def jp(self) -> int:
        # per-group lane packing: slice offsets are ox*jp with ox a
        # multiple of 8, so jp must be a multiple of 16 for provable
        # 128-alignment.  Joints beyond 16 go into further groups.
        return 16

    @property
    def groups(self) -> int:
        return _round_up(self.num_joints, self.jp) // self.jp

    @property
    def jp_total(self) -> int:
        return self.groups * self.jp

    @property
    def pack_dtype(self):
        # fast mode stores packed heatmaps in bf16: halves the VMEM
        # working set and HBM traffic, and the stage-1 MXU pass consumes
        # the windows natively instead of casting f32->bf16 per
        # (tile, view).  Exact mode keeps f32 end to end.
        return jnp.float32 if self.exact or not self.vpu_bf16 else jnp.bfloat16

    @property
    def sub(self) -> int:
        # sublane granularity of y-window origins: bf16 VMEM tiles are
        # (16, 128), so bf16-packed slices need 16-aligned y origins
        return 16 if self.pack_dtype == jnp.bfloat16 else 8

    @property
    def hp(self) -> int:
        # zero-padded H: padding rows are zeros, which is exactly
        # grid_sample zeros-padding for samples past the image edge
        return _round_up(self.height, self.sub)

    @property
    def wp(self) -> int:
        return _round_up(self.width, 8)

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
        return min(self.window_x, self.wp)

    @property
    def yw(self) -> int:
        return min(self.window_y, self.hp)

    @property
    def nx(self) -> int:
        """Disjoint x windows covering the padded image (slow path)."""
        return -(-self.wp // self.xw)

    @property
    def ny(self) -> int:
        return -(-self.hp // self.yw)

    def validate(self):
        if self.xw % 8 or self.yw % self.sub:
            raise ValueError(
                f"windows must be multiples of (8, {self.sub}) at dtype "
                f"{self.pack_dtype}"
            )


def pack_heatmaps(heatmaps: jnp.ndarray, spec: SampleKernelSpec) -> jnp.ndarray:
    """(V, H, W, J) -> (G, V, Hp, Wp*16) in spec.pack_dtype (bf16 in
    fast mode, f32 exact), lane layout x-major joint-minor within each
    16-joint group.

    The y axis stays on sublanes (the MXU contraction dim); x and joints
    share lanes so an x window is one aligned contiguous lane slice.
    H/W pad rows/cols are zeros — sampling them reproduces zeros-padding
    bilinear bit-exactly, so no caller needs H or W divisible by 8.
    """
    V, H, W, J = heatmaps.shape
    jp, G = spec.jp, spec.groups
    hmp = jnp.pad(
        heatmaps.astype(spec.pack_dtype),
        (
            (0, 0),
            (0, spec.hp - H),
            (0, spec.wp - W),
            (0, G * jp - J),
        ),
    )  # (V, Hp, Wp, G*jp)
    # group g takes joints [g*jp, (g+1)*jp): (G, V, Hp, Wp*jp)
    return hmp.reshape(V, spec.hp, spec.wp, G, jp).transpose(3, 0, 1, 2, 4).reshape(
        G, V, spec.hp, spec.wp * jp
    )


def _window_contrib(win, x, y, ox, oy, lx, ly, spec: SampleKernelSpec):
    """Contribution of one heatmap window to all samples of a tile.

    win: (YW, XW*JP) slice whose origin is (oy, ox); x/y: (S,) pixel
    coords; lx/ly: logical coverage start — pixels with index < lx (< ly)
    are zero-weighted so the disjoint-cover slow path never counts a
    pixel twice when the final window is clipped into the image.
    Returns (JP, S) f32.
    """
    s = spec.padded_samples
    xw, yw, jp = spec.xw, spec.yw, spec.jp
    precision = (
        jax.lax.Precision.HIGHEST if spec.exact else jax.lax.Precision.DEFAULT
    )

    yi = jax.lax.broadcasted_iota(jnp.int32, (yw, s), 0) + oy
    yif = yi.astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[None, :] - yif))  # (YW, S)
    wy = jnp.where(yi >= ly, wy, 0.0)

    xi = jax.lax.broadcasted_iota(jnp.int32, (xw, s), 0) + ox
    xif = xi.astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[None, :] - xif))  # (XW, S)
    wx = jnp.where(xi >= lx, wx, 0.0)

    if spec.pack_dtype == jnp.bfloat16:
        # fast path, bf16 storage: the MXU consumes the bf16 window
        # natively (no per-window f32->bf16 cast; Mosaic requires the
        # accumulator itself to stay 32-bit); stage 2 is the bf16 VPU
        # multiply + sublane reduction.  (A selector-matmul x-reduction
        # was tried and measured SLOWER: with M=jp=16 the 128-wide MXU
        # pads 87% of its work.)
        t = jax.lax.dot_general(
            win,
            wy.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (XW*JP, S), rows x-major joint-minor
        p3 = t.astype(jnp.bfloat16).reshape(xw, jp, s) * wx.astype(
            jnp.bfloat16
        )[:, None, :]
        return jnp.sum(p3, axis=0).astype(jnp.float32)

    # y interpolation: one MXU contraction over the y window
    t = jax.lax.dot_general(
        win,
        wy,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (XW*JP, S), rows x-major joint-minor

    # f32 multiply + sublane-sum: bit-stable parity path (exact mode)
    # and the vpu_bf16=False fast mode
    p3 = t.reshape(xw, jp, s) * wx[:, None, :]
    return jnp.sum(p3, axis=0)


def _slice_win(hm_ref, v, ox, oy, spec):
    return hm_ref[
        v,
        pl.ds(pl.multiple_of(oy, spec.sub), spec.yw),
        pl.ds(pl.multiple_of(ox * spec.jp, 128), spec.xw * spec.jp),
    ]


def compute_window_flags(coords: jnp.ndarray, spec: SampleKernelSpec):
    """Anchored window origins + exactness flags + support bounds for
    every (tile, view), packed into (NB, V, 3) int32 for the kernel.

    Runs as ONE fused XLA pass over all tiles — in-kernel per-tile
    cross-lane reductions for the same quantities measured ~4ms/frame
    on the Panoptic JLN pass.

    The in-image pixel support of a sample is [max(floor, 0),
    min(floor+1, dim-1)] (empty for fully out-of-image samples, which
    contribute zero either way and are excluded from the anchor).  The
    anchored window is exact iff it covers every support pixel; since
    the clipped origin can only sit at or below the support minimum,
    only the upper edge needs checking.

    Packing: word0 = ox//8 | (oy//sub)<<12 | fast<<24;
             word1 = (ax+1) | (bx+1)<<16;  word2 = (ay+1) | (by+1)<<16.
    (x origins quantize to 8 — the lane offset ox*jp is then 128-aligned —
    while y origins quantize to the dtype sublane granularity spec.sub.)
    """
    w, h = spec.width, spec.height
    xw, yw = spec.xw, spec.yw
    wp, hp = spec.wp, spec.hp
    sub = spec.sub
    x = coords[:, :, 0, :]
    y = coords[:, :, 1, :]

    def support_bounds(v, dim):
        lo = jnp.floor(v)
        hi = lo + 1.0
        nonempty = (hi >= 0.0) & (lo <= dim - 1.0)
        cov_lo = jnp.where(nonempty, jnp.maximum(lo, 0.0), float(dim))
        cov_hi = jnp.where(nonempty, jnp.minimum(hi, dim - 1.0), -1.0)
        return (
            jnp.min(cov_lo, axis=-1).astype(jnp.int32),
            jnp.max(cov_hi, axis=-1).astype(jnp.int32),
        )

    ax, bx = support_bounds(x, w)  # (NB, V)
    ay, by = support_bounds(y, h)
    ox8 = jnp.clip(ax, 0, wp - xw) // 8
    oyq = jnp.clip(ay, 0, hp - yw) // sub
    fast = (bx <= ox8 * 8 + (xw - 1)) & (by <= oyq * sub + (yw - 1))
    w0 = ox8 | (oyq << 12) | (fast.astype(jnp.int32) << 24)
    w1 = (ax + 1) | ((bx + 1) << 16)
    w2 = (ay + 1) | ((by + 1) << 16)
    return jnp.stack([w0, w1, w2], axis=-1)  # (NB, V, 3) int32


def _unpack_flags(flags_ref, v, spec):
    w0 = flags_ref[0, v, 0]
    w1 = flags_ref[0, v, 1]
    w2 = flags_ref[0, v, 2]
    ox = pl.multiple_of((w0 & 0xFFF) * 8, 8)
    oy = pl.multiple_of(((w0 >> 12) & 0xFFF) * spec.sub, spec.sub)
    fast = (w0 >> 24) > 0
    bounds = (
        (w1 & 0xFFFF) - 1,
        (w1 >> 16) - 1,
        (w2 & 0xFFFF) - 1,
        (w2 >> 16) - 1,
    )
    return ox, oy, fast, bounds


def _cover_accumulate(acc_ref, x, y, hm_ref, v, bounds, spec):
    """Exact full-cover accumulation for one (tile, view): disjoint
    windows tile the padded image; the final window of each axis is
    clipped back inside and its overlap zero-masked via the logical
    starts lx/ly.  Windows that cannot intersect the tile's support
    range are skipped, so a footprint only slightly larger than one
    window costs ~2 windows, not ny*nx.  acc_ref is a (JP, S) f32 VMEM
    scratch accumulator."""
    xw, yw = spec.xw, spec.yw
    wp, hp = spec.wp, spec.hp
    nx, ny = spec.nx, spec.ny
    axi, bxi, ayi, byi = bounds

    def body(k, carry):
        ky = k // nx
        kx = k - ky * nx
        lyk = ky * yw
        lxk = kx * xw
        oyk = pl.multiple_of(jnp.minimum(lyk, hp - yw), spec.sub)
        oxk = pl.multiple_of(jnp.minimum(lxk, wp - xw), 8)
        hit = (
            (bxi >= lxk)
            & (axi <= oxk + (xw - 1))
            & (byi >= lyk)
            & (ayi <= oyk + (yw - 1))
        )

        @pl.when(hit)
        def _():
            acc_ref[...] += _window_contrib(
                _slice_win(hm_ref, v, oxk, oyk, spec), x, y, oxk, oyk,
                lxk, lyk, spec,
            )

        return carry

    jax.lax.fori_loop(0, ny * nx, body, jnp.int32(0))


def _plane_lanes(spec: SampleKernelSpec) -> Tuple[int, int, int]:
    """Lane widths of the three per-tile plane-partial outputs."""
    tx, ty, tz = spec.tile
    return (
        _round_up(tx * ty, 128),
        _round_up(tx * tz, 128),
        _round_up(ty * tz, 128),
    )


def _plane_selectors(spec: SampleKernelSpec) -> Tuple[np.ndarray, np.ndarray]:
    """0/1 compaction matrices (S, LXY) / (S, LXZ): after the roll-max
    chains, the group-start lane dx*(ty*tz)+dy*tz (resp. +dz) holds that
    group's max; one MXU matmul gathers those lanes into plane order.
    (The yz plane needs no selector: its group starts are lanes
    [0, ty*tz), a direct slice.)"""
    tx, ty, tz = spec.tile
    s = spec.padded_samples
    lxy, lxz, _ = _plane_lanes(spec)
    sel_xy = np.zeros((s, lxy), np.float32)
    for dx in range(tx):
        for dy in range(ty):
            sel_xy[dx * ty * tz + dy * tz, dx * ty + dy] = 1.0
    sel_xz = np.zeros((s, lxz), np.float32)
    for dx in range(tx):
        for dz in range(tz):
            sel_xz[dx * ty * tz + dz, dx * tz + dz] = 1.0
    return sel_xy, sel_xz


def _roll_max(a, stride, count):
    """Max over `count` lanes spaced `stride` apart: after log2(count)
    rounds of rotate-left + max, each group-START lane holds its group
    max (other lanes hold sliding-window garbage that the compaction
    never reads).  pltpu.roll requires non-negative shifts, so a left
    rotation by sh is a roll by (size - sh)."""
    size = a.shape[1]
    sh = stride
    while sh < stride * count:
        a = jnp.maximum(a, pltpu.roll(a, size - sh, axis=1))
        sh *= 2
    return a


def _emit_plane_partials(fa, refs, sels, spec, precision):
    """fa (JP, S) finalized tile values -> three per-tile orthographic
    max-projections written to the output refs.  Replaces the XLA-side
    cube materialization + strided max reductions (~3.4ms/frame of HBM
    relayout traffic at the Panoptic profile) with in-register lane
    rotations and two tiny selector matmuls."""
    oxy_ref, oxz_ref, oyz_ref = refs
    sel_xy_ref, sel_xz_ref = sels
    tx, ty, tz = spec.tile
    _, _, lyz = _plane_lanes(spec)

    # Mosaic rotates are 32-bit only; 0/1 selection runs through a tiny
    # matmul.  When the tile values are bf16-representable (bf16 packing)
    # a DEFAULT-precision pass is exact: 1.0 and the values are both
    # bf16-exact, so every partial product is exact and each output lane
    # sums exactly one nonzero product.  With f32 packing, DEFAULT is a
    # single bf16 pass that would round the values, so force HIGHEST for
    # the selector matmuls — the contraction is tiny (S x plane lanes),
    # cost is noise.
    sel_precision = (
        precision if fa.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    )
    f = fa.astype(jnp.float32)
    az = _roll_max(f, 1, tz)  # max over dz -> xy plane
    ay = _roll_max(f, tz, ty)  # max over dy -> xz plane
    ax = _roll_max(f, ty * tz, tx)  # max over dx -> yz plane

    oxy_ref[0] = jax.lax.dot_general(
        az, sel_xy_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=sel_precision,
    ).astype(fa.dtype)
    oxz_ref[0] = jax.lax.dot_general(
        ay, sel_xz_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=sel_precision,
    ).astype(fa.dtype)
    oyz_ref[0] = ax[:, :lyz].astype(fa.dtype)


@dataclasses.dataclass(frozen=True)
class FusedProj:
    """Static constants of the fused in-kernel voxel->pixel projection
    (world tile origin + iota offsets -> camera -> distortion -> resize
    affine -> heatmap frame), mirroring project_to_norm_coords +
    project_points op-for-op (geometry/grids.py:58-93,
    geometry/cameras.py:90-126) so the in-kernel coordinates match the
    XLA coords pass to float rounding.  All fields are Python floats
    (trace-time constants baked into the kernel)."""

    step: Tuple[float, float, float]  # voxel pitch (mm) per axis
    t: Tuple[float, float, float, float, float, float]  # 2x3 resize affine
    clip_hi: float  # max(ori_image_size): post-projection pixel clamp
    hm_w: float  # heatmap W
    hm_h: float
    img_w: float  # network input W
    img_h: float
    wm1: float  # heatmap W - 1
    hm1: float


def _tile_coords(origin_ref, row, cams_ref, v, spec: SampleKernelSpec,
                 fp: FusedProj):
    """In-kernel pixel coords of one tile's samples for view v: (x, y)
    each (S,) f32.  Replaces the XLA coords pass + its (NB, V, 2, S) HBM
    round trip (~105MB/frame at the Panoptic JLN profile).  The op
    sequence mirrors project_points/project_to_norm_coords exactly (same
    associativity), so values agree with the XLA pass to f32 rounding —
    the conservative corner-interval window flags
    (compute_window_flags_fused) absorb any residual ulp drift."""
    s = spec.padded_samples
    tx, ty, tz = spec.tile
    n = spec.samples
    shz = tz.bit_length() - 1
    shyz = (ty * tz).bit_length() - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    lane = jnp.minimum(lane, n - 1)  # pad lanes replicate the last sample
    dx = (lane >> shyz).astype(jnp.float32)
    dy = ((lane >> shz) & (ty - 1)).astype(jnp.float32)
    dz = (lane & (tz - 1)).astype(jnp.float32)

    # origins live in SMEM (whole array, dynamically indexed by the grid
    # step): a (1, 3)-blocked VMEM input is not lowerable — Mosaic
    # requires sublane-dim blocks divisible by 8
    wx = origin_ref[row, 0] + dx * fp.step[0]
    wy = origin_ref[row, 1] + dy * fp.step[1]
    wz = origin_ref[row, 2] + dz * fp.step[2]

    def c(i):
        return cams_ref[v, i]

    # world -> camera (explicit multiply-adds, geometry/cameras.py:109-117)
    xt0, xt1, xt2 = wx - c(9), wy - c(10), wz - c(11)
    xc0 = xt0 * c(0) + xt1 * c(1) + xt2 * c(2)
    xc1 = xt0 * c(3) + xt1 * c(4) + xt2 * c(5)
    xc2 = xt0 * c(6) + xt1 * c(7) + xt2 * c(8)
    y0 = xc0 / (xc2 + 1e-5)
    y1 = xc1 / (xc2 + 1e-5)

    # radial + tangential distortion (cameras.py:120-126)
    r2 = y0 * y0 + y1 * y1
    d = 1.0 + c(16) * r2 + c(17) * r2 * r2 + c(18) * r2 * r2 * r2
    u = y0 * d + 2.0 * c(19) * y0 * y1 + c(20) * (r2 + 2.0 * y0 * y0)
    w_ = y1 * d + 2.0 * c(20) * y0 * y1 + c(19) * (r2 + 2.0 * y1 * y1)
    px = u * c(12) + c(14)
    py = w_ * c(13) + c(15)

    # original-image clamp, resize affine, heatmap rescale, norm clamp,
    # back to the pixel frame (grids.py:75-93 op order)
    px = jnp.clip(px, -1.0, fp.clip_hi)
    py = jnp.clip(py, -1.0, fp.clip_hi)
    qx = px * fp.t[0] + py * fp.t[1] + fp.t[2]
    qy = px * fp.t[3] + py * fp.t[4] + fp.t[5]
    qx = qx * fp.hm_w / fp.img_w
    qy = qy * fp.hm_h / fp.img_h
    nx_ = jnp.clip(qx / fp.wm1 * 2.0 - 1.0, -1.1, 1.1)
    ny_ = jnp.clip(qy / fp.hm1 * 2.0 - 1.0, -1.1, 1.1)
    x = (nx_ + 1.0) * 0.5 * fp.wm1
    y = (ny_ + 1.0) * 0.5 * fp.hm1
    return x.reshape(s), y.reshape(s)


# ---- interval arithmetic (host of the fused window flags) -----------------
# intervals are (lo, hi) pairs of equal-shape arrays; every op is
# conservative, so the resulting pixel bounds are GUARANTEED supersets of
# the in-kernel sample coordinates (up to f32 rounding, absorbed by the
# caller's epsilon).


def _imul(a, b):
    p1, p2 = a[0] * b[0], a[0] * b[1]
    p3, p4 = a[1] * b[0], a[1] * b[1]
    return (
        jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
        jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
    )


def _iadd(a, b):
    return a[0] + b[0], a[1] + b[1]


def _isq(a):
    lo2, hi2 = a[0] * a[0], a[1] * a[1]
    spans0 = (a[0] <= 0.0) & (a[1] >= 0.0)
    return (
        jnp.where(spans0, 0.0, jnp.minimum(lo2, hi2)),
        jnp.maximum(lo2, hi2),
    )


def _icmul(k, a):
    """Constant (scalar array or python float) times interval."""
    lo, hi = k * a[0], k * a[1]
    return jnp.minimum(lo, hi), jnp.maximum(lo, hi)


def _ichain_affine(xI, yI, t0, t1, t2):
    """Interval of t0*x + t1*y + t2 with python-float coefficients."""
    xs = (t0 * xI[0], t0 * xI[1]) if t0 >= 0 else (t0 * xI[1], t0 * xI[0])
    ys = (t1 * yI[0], t1 * yI[1]) if t1 >= 0 else (t1 * yI[1], t1 * yI[0])
    return xs[0] + ys[0] + t2, xs[1] + ys[1] + t2


def compute_window_flags_fused(
    origins: jnp.ndarray,  # (NB, 3) world coords of each tile's first voxel
    cams: jnp.ndarray,  # (V, 21)
    spec: SampleKernelSpec,
    fp: FusedProj,
    eps_px: float = 0.5,
):
    """Window anchors/flags for the fused-coords kernel, from projected
    TILE CORNERS + interval-arithmetic distortion bounds instead of the
    per-sample coords (8 points per tile/view instead of spec.samples —
    the coords pass this replaces wrote ~105MB/frame).

    Guarantee chain: depth is linear in world coords, so all-corners
    depth >= delta bounds the whole tile away from the camera plane;
    perspective projection of a convex polytope on one side of that
    plane is the convex hull of its vertex projections, so the corner
    min/max bound every sample's undistorted (xn, yn); the distortion
    polynomial and the affine/clamp chain are then evaluated in interval
    arithmetic, which is conservative by construction.  Tiles that fail
    the depth precondition get full-image support bounds and fast=0 —
    the kernel's exact cover path handles them for ANY coordinates.
    eps_px absorbs f32 associativity drift between this pass and the
    in-kernel per-sample evaluation (measured drift is <1e-3 px; the
    margin only costs fast-rate, never correctness)."""
    tx, ty, tz = spec.tile
    corner_off = np.array(
        [
            [dx * (tx - 1) * fp.step[0],
             dy * (ty - 1) * fp.step[1],
             dz * (tz - 1) * fp.step[2]]
            for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
        ],
        np.float32,
    )  # (8, 3)
    pts = origins[:, None, :] + jnp.asarray(corner_off)[None]  # (NB, 8, 3)

    def per_view(cam):
        R = cam[0:9].reshape(3, 3)
        T = cam[9:12]
        f = cam[12:14]
        cc = cam[14:16]
        k = cam[16:19]
        tp = cam[19:21]
        xt = pts - T[None, None, :]
        xc0 = xt[..., 0] * R[0, 0] + xt[..., 1] * R[0, 1] + xt[..., 2] * R[0, 2]
        xc1 = xt[..., 0] * R[1, 0] + xt[..., 1] * R[1, 1] + xt[..., 2] * R[1, 2]
        xc2 = xt[..., 0] * R[2, 0] + xt[..., 1] * R[2, 1] + xt[..., 2] * R[2, 2]
        z = xc2 + 1e-5
        ok = jnp.min(z, axis=-1) >= 1e-4  # (NB,)
        zsafe = jnp.where(z > 0, z, 1.0)  # avoid inf; gated by ok anyway
        y0 = xc0 / zsafe
        y1 = xc1 / zsafe
        yxI = (jnp.min(y0, -1), jnp.max(y0, -1))
        yyI = (jnp.min(y1, -1), jnp.max(y1, -1))

        r2I = _iadd(_isq(yxI), _isq(yyI))
        r4I = _isq(r2I)
        r6I = _imul(r2I, r4I)
        dI = _iadd(
            _iadd((jnp.ones_like(r2I[0]), jnp.ones_like(r2I[0])),
                  _icmul(k[0], r2I)),
            _iadd(_icmul(k[1], r4I), _icmul(k[2], r6I)),
        )
        xyI = _imul(yxI, yyI)
        uI = _iadd(
            _iadd(_imul(yxI, dI), _icmul(2.0 * tp[0], xyI)),
            _icmul(tp[1], _iadd(r2I, _icmul(2.0, _isq(yxI)))),
        )
        vI = _iadd(
            _iadd(_imul(yyI, dI), _icmul(2.0 * tp[1], xyI)),
            _icmul(tp[0], _iadd(r2I, _icmul(2.0, _isq(yyI)))),
        )
        pxI = _iadd(_icmul(f[0], uI), (cc[0], cc[0]))
        pyI = _iadd(_icmul(f[1], vI), (cc[1], cc[1]))

        # original-image clamp (monotone), resize affine (sign-aware),
        # heatmap rescale, norm clamp, back to the pixel frame
        pxC = (jnp.clip(pxI[0], -1.0, fp.clip_hi),
               jnp.clip(pxI[1], -1.0, fp.clip_hi))
        pyC = (jnp.clip(pyI[0], -1.0, fp.clip_hi),
               jnp.clip(pyI[1], -1.0, fp.clip_hi))
        qxI = _ichain_affine(pxC, pyC, fp.t[0], fp.t[1], fp.t[2])
        qyI = _ichain_affine(pxC, pyC, fp.t[3], fp.t[4], fp.t[5])
        sx = fp.hm_w / fp.img_w
        sy = fp.hm_h / fp.img_h
        qxI = _icmul(sx, qxI)
        qyI = _icmul(sy, qyI)

        def to_pixel(qI, m1):
            lo = jnp.clip(qI[0] / m1 * 2.0 - 1.0, -1.1, 1.1)
            hi = jnp.clip(qI[1] / m1 * 2.0 - 1.0, -1.1, 1.1)
            return ((lo + 1.0) * 0.5 * m1 - eps_px,
                    (hi + 1.0) * 0.5 * m1 + eps_px)

        xI = to_pixel(qxI, fp.wm1)
        yI = to_pixel(qyI, fp.hm1)
        return ok, xI[0], xI[1], yI[0], yI[1]

    ok, xlo, xhi, ylo, yhi = jax.vmap(per_view, out_axes=1)(cams)  # (NB, V)

    w, h = spec.width, spec.height
    xw, yw = spec.xw, spec.yw
    wp, hp = spec.wp, spec.hp
    sub = spec.sub

    # conservative support bounds: [floor(lo), floor(hi)+1] clipped into
    # the image always CONTAINS the true per-sample support union; tiles
    # failing the depth precondition get the full image (cover path
    # skips nothing — rare and exact)
    ax = jnp.where(ok, jnp.clip(jnp.floor(xlo), 0, w - 1), 0).astype(jnp.int32)
    bx = jnp.where(
        ok, jnp.clip(jnp.floor(xhi) + 1, 0, w - 1), w - 1
    ).astype(jnp.int32)
    ay = jnp.where(ok, jnp.clip(jnp.floor(ylo), 0, h - 1), 0).astype(jnp.int32)
    by = jnp.where(
        ok, jnp.clip(jnp.floor(yhi) + 1, 0, h - 1), h - 1
    ).astype(jnp.int32)
    ox8 = jnp.clip(ax, 0, wp - xw) // 8
    oyq = jnp.clip(ay, 0, hp - yw) // sub
    fast = ok & (bx <= ox8 * 8 + (xw - 1)) & (by <= oyq * sub + (yw - 1))
    w0 = ox8 | (oyq << 12) | (fast.astype(jnp.int32) << 24)
    w1 = (ax + 1) | ((bx + 1) << 16)
    w2 = (ay + 1) | ((by + 1) << 16)
    return jnp.stack([w0, w1, w2], axis=-1)  # (NB, V, 3) int32


def _kernel_body(valid_ref, *refs, spec, masked, planes, fused=None):
    """Grid step = one tile: camera-mean of per-view bilinear samples.

    Invalid blocks (undetected proposal slots) write zeros and skip all
    sampling math, so JLN cost scales with the number of DETECTED people
    like the reference's valid-only loop (joint_localization_net.py:77).

    Structure: the anchored-window contribution runs UNCONDITIONALLY for
    every view and accumulates in registers, multiplied by the view's
    precomputed exactness flag (a broadcast 0/1 — wrong fast values of
    slow views are zeroed for ~8k multiplies, not a branch).  Only views
    whose flag failed then add their exact hit-skipped cover
    contribution through the output ref.  The common all-fast path is
    branch-free with a single output write; flags/anchors arrive
    precomputed (compute_window_flags) so the kernel does no cross-lane
    reductions.

    masked=True: a per-sample (1, S) weight block (the caller's
    axis-separable bbox mask) multiplies the final mean — applying it
    here saves the epilogue's 3 full-cube f32 broadcast multiplies,
    which XLA was paying ~4ms/frame of HBM traffic for.  The output ref
    may be bf16 (halves the HBM write + the epilogue's read traffic);
    the slow cover path accumulates in a f32 VMEM scratch either way.

    planes=True: instead of the (JP, S) sample cube, emit the tile's
    three orthographic max-projection partials (see
    _emit_plane_partials) — the JLN never materializes the cube at all.
    """
    single = spec.nx == 1 and spec.ny == 1
    refs = list(refs)
    acc_ref = None if single else refs.pop(-1)  # f32 scratch
    if planes:
        out_refs = (refs[-3], refs[-2], refs[-1])
        del refs[-3:]
        sel_refs = (refs[-2], refs[-1])
        del refs[-2:]
        out_ref = out_refs[0]
    else:
        out_ref = refs.pop(-1)
        out_refs = sel_refs = None
    mask_ref = refs.pop(-1) if masked else None
    if fused is not None:
        # fused-coords mode: per-sample pixel coords are computed inside
        # the kernel from the tile's world origin + the camera rig; the
        # coords input (and its HBM round trip) does not exist
        flags_ref, origin_ref, cams_ref, hm_ref = refs
        coords_ref = None
    elif single:
        coords_ref, hm_ref = refs
        flags_ref = None
    else:
        flags_ref, coords_ref, hm_ref = refs
    i = pl.program_id(0)
    V = spec.n_views
    odt = out_ref.dtype
    precision = (
        jax.lax.Precision.HIGHEST if spec.exact else jax.lax.Precision.DEFAULT
    )

    def store(fa):
        if planes:
            _emit_plane_partials(fa, out_refs, sel_refs, spec, precision)
        else:
            out_ref[0] = fa

    @pl.when(valid_ref[i] <= 0)
    def _():
        if planes:
            for r, lanes in zip(out_refs, _plane_lanes(spec)):
                r[0] = jnp.zeros((spec.jp, lanes), odt)
        else:
            out_ref[0] = jnp.zeros((spec.jp, spec.padded_samples), odt)

    @pl.when(valid_ref[i] > 0)
    def _():
        acc = jnp.zeros((spec.jp, spec.padded_samples), jnp.float32)
        slow_views = []
        for v in range(V):
            if fused is not None:
                x, y = _tile_coords(origin_ref, i, cams_ref, v, spec, fused)
            else:
                x = coords_ref[0, v, 0, :]
                y = coords_ref[0, v, 1, :]
            if single:
                # window = whole padded image: always exact
                acc += _window_contrib(
                    _slice_win(hm_ref, v, 0, 0, spec), x, y, 0, 0, 0, 0,
                    spec,
                )
                continue
            ox, oy, fast, bounds = _unpack_flags(flags_ref, v, spec)
            slow_views.append((x, y, fast, bounds))
            acc += _window_contrib(
                _slice_win(hm_ref, v, ox, oy, spec), x, y, ox, oy, 0, 0,
                spec,
            ) * fast.astype(jnp.float32)

        def finalize(a):
            a = jnp.clip(a * (1.0 / V), 0.0, 1.0)
            if masked:
                # mask blocks carry 8 rows (sublane-divisibility rule);
                # row i % 8 belongs to this grid step.  Dynamic sublane
                # loads can't be proven aligned for bf16 tiles, so select
                # the row with a one-hot sublane reduction instead.
                rows = mask_ref[...].astype(jnp.float32)  # (8, S)
                sel = jax.lax.broadcasted_iota(
                    jnp.int32, rows.shape, 0
                ) == (i % 8)
                row = jnp.sum(
                    jnp.where(sel, rows, 0.0), axis=0, keepdims=True
                )  # (1, S)
                a = a * row
            return a.astype(odt)

        if single:
            store(finalize(acc))
            return

        all_fast = slow_views[0][2]
        for v in range(1, V):
            all_fast = jnp.logical_and(all_fast, slow_views[v][2])

        @pl.when(all_fast)
        def _():
            # common case: every view exact through its anchored window —
            # single store, no scratch round trip
            store(finalize(acc))

        @pl.when(jnp.logical_not(all_fast))
        def _():
            acc_ref[...] = acc
            for v in range(V):
                x, y, fast, bounds = slow_views[v]

                @pl.when(jnp.logical_not(fast))
                def _(x=x, y=y, v=v, bounds=bounds):
                    _cover_accumulate(acc_ref, x, y, hm_ref, v, bounds, spec)

            store(finalize(acc_ref[...]))


def _sample_tiles_group(
    hm_group: jnp.ndarray,  # (V, Hp, Wp*JP) one 16-joint group
    coords: jnp.ndarray,  # (NB, V, 2, S) pixel coords, or (NB, 3) world
    #                        tile origins in fused-coords mode
    spec: SampleKernelSpec,
    valid: jnp.ndarray,  # (NB,) int32
    flags: jnp.ndarray,  # (NB, V, 3) int32 or None when single-window
    mask: jnp.ndarray,  # (NB, S) per-sample weights or None
    out_dtype,
    planes: bool = False,
    fused: FusedProj = None,
    cams: jnp.ndarray = None,  # (V, 21), fused mode only
):  # (NB, JP, S) cube, or ((NB,JP,LXY),(NB,JP,LXZ),(NB,JP,LYZ)) partials
    nb = coords.shape[0]
    V = spec.n_views
    s = spec.padded_samples
    single = flags is None
    out_shape = jax.ShapeDtypeStruct((nb, spec.jp, s), out_dtype)
    kern = functools.partial(
        _kernel_body, spec=spec, masked=mask is not None, planes=planes,
        fused=fused,
    )
    if fused is not None:
        in_specs = [
            pl.BlockSpec(
                (1, V, 3), lambda i, _v: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            # whole array in SMEM: read as scalars at row program_id(0)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cams resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # heatmaps resident
        ]
        args = [valid, flags, coords, cams, hm_group]
    else:
        in_specs = [
            pl.BlockSpec(
                (1, V, 2, s), lambda i, _v: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # heatmaps resident
        ]
        args = [valid, coords, hm_group]
        if not single:
            in_specs.insert(
                0,
                pl.BlockSpec(
                    (1, V, 3), lambda i, _v: (i, 0, 0),
                    memory_space=pltpu.VMEM
                ),
            )
            args = [valid, flags, coords, hm_group]
    if mask is not None:
        # 8 rows per block (sublane divisibility); consecutive grid steps
        # share a block so each group of 8 is fetched once
        in_specs.append(
            pl.BlockSpec(
                (8, s), lambda i, _v: (i // 8, 0), memory_space=pltpu.VMEM
            )
        )
        args.append(mask)
    if planes:
        sel_xy, sel_xz = _plane_selectors(spec)
        for sel in (sel_xy, sel_xz):
            in_specs.append(
                pl.BlockSpec(
                    sel.shape, lambda i, _v: (0, 0), memory_space=pltpu.VMEM
                )
            )
            args.append(jnp.asarray(sel))  # f32: rolls/selection run f32
        lanes = _plane_lanes(spec)
        out_shape = [
            jax.ShapeDtypeStruct((nb, spec.jp, l), out_dtype) for l in lanes
        ]
        out_specs = [
            pl.BlockSpec(
                (1, spec.jp, l), lambda i, _v: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for l in lanes
        ]
    else:
        out_specs = pl.BlockSpec(
            (1, spec.jp, s), lambda i, _v: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=(
            [] if single else [pltpu.VMEM((spec.jp, s), jnp.float32)]
        ),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=spec.interpret,
    )(*args)


def sample_tiles(
    hm_packed: jnp.ndarray,  # (G, V, Hp, Wp*JP) from pack_heatmaps
    coords: jnp.ndarray,  # (NB, V, 2, S) pixel coords
    spec: SampleKernelSpec,
    valid: jnp.ndarray = None,  # (NB,) int/bool; 0 = skip block, zeros
    mask: jnp.ndarray = None,  # (NB, S) per-sample output weights
    out_dtype=jnp.float32,  # bf16 halves output HBM traffic (fast mode)
    emit_planes: bool = False,  # emit per-tile plane partials, no cube
):  # (NB, JP_TOTAL, S), or a 3-tuple of (NB, JP_TOTAL, L*) partials
    """Camera-averaged bilinear samples for NB tiles of S samples each,
    exact for any coordinates (see module docstring).  Joint groups run
    as consecutive kernel launches sharing the same coords.

    emit_planes=True: returns the per-tile orthographic max-projection
    partials (xy, xz, yz) instead of the sample cube — the dominant JLN
    consumer never needs the cube, and skipping it saves its HBM round
    trip plus XLA's strided reduction relayouts."""
    spec.validate()
    nb, V, _, s_in = coords.shape
    s = spec.padded_samples
    if emit_planes:
        tx, ty, tz = spec.tile
        if s_in != s or any(d & (d - 1) for d in (tx, ty, tz)):
            raise ValueError(
                "emit_planes requires power-of-two tile dims and "
                f"samples==padded_samples; got tile {spec.tile}, "
                f"S {s_in} vs {s}"
            )
    if s_in != s:
        # lane alignment: replicate the last sample into the pad columns
        # (keeps window anchors untouched); output is sliced back below
        coords = jnp.concatenate(
            [coords, jnp.repeat(coords[..., -1:], s - s_in, axis=-1)], axis=-1
        )
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, s - s_in)))
    if valid is None:
        valid = jnp.ones((nb,), jnp.int32)
    else:
        valid = valid.astype(jnp.int32)
    if mask is not None:
        mask = mask.astype(spec.pack_dtype)
        if nb % 8:
            mask = jnp.pad(mask, ((0, 8 - nb % 8), (0, 0)))
    single = spec.nx == 1 and spec.ny == 1
    flags = None if single else compute_window_flags(coords, spec)
    outs = [
        _sample_tiles_group(
            hm_packed[g], coords, spec, valid, flags, mask, out_dtype,
            planes=emit_planes,
        )
        for g in range(spec.groups)
    ]
    if emit_planes:
        if spec.groups == 1:
            return tuple(outs[0])
        return tuple(
            jnp.concatenate([o[k] for o in outs], axis=1) for k in range(3)
        )
    out = outs[0] if spec.groups == 1 else jnp.concatenate(outs, axis=1)
    return out[:, :, :s_in] if s_in != s else out


def sample_tiles_fused(
    hm_packed: jnp.ndarray,  # (G, V, Hp, Wp*JP) from pack_heatmaps
    origins: jnp.ndarray,  # (NB, 3) world coords of each tile's 1st voxel
    cams: jnp.ndarray,  # (V, 21) packed rig
    fp: FusedProj,
    spec: SampleKernelSpec,
    valid: jnp.ndarray = None,
    mask: jnp.ndarray = None,
    out_dtype=jnp.float32,
    emit_planes: bool = False,
):
    """sample_tiles with the voxel->pixel projection fused INTO the
    kernel: callers pass world-space tile origins + the camera rig
    instead of per-sample pixel coords, eliminating the XLA coords pass
    and its (NB, V, 2, S) HBM round trip (~105MB/frame at the Panoptic
    JLN profile).  Window flags come from projected tile corners +
    interval-arithmetic distortion bounds (conservative, see
    compute_window_flags_fused); every tile the corner bound cannot
    certify takes the exact in-kernel cover path, so the result is exact
    for any rig, like sample_tiles.

    Requires power-of-two tile dims (in-kernel sample unravel uses
    shifts) and a multi-window spec (nx*ny > 1)."""
    spec.validate()
    tx, ty, tz = spec.tile
    if any(d & (d - 1) for d in spec.tile):
        raise ValueError(f"fused coords require power-of-two tile, got {spec.tile}")
    if spec.nx == 1 and spec.ny == 1:
        raise ValueError("fused coords require a multi-window spec")
    nb = origins.shape[0]
    s = spec.padded_samples
    if emit_planes and spec.samples != s:
        raise ValueError("emit_planes requires samples==padded_samples")
    if valid is None:
        valid = jnp.ones((nb,), jnp.int32)
    else:
        valid = valid.astype(jnp.int32)
    if mask is not None:
        if mask.shape[-1] != s:
            mask = jnp.pad(mask, ((0, 0), (0, s - mask.shape[-1])))
        mask = mask.astype(spec.pack_dtype)
        if nb % 8:
            mask = jnp.pad(mask, ((0, 8 - nb % 8), (0, 0)))
    origins = origins.astype(jnp.float32)
    cams = cams.astype(jnp.float32)
    flags = compute_window_flags_fused(origins, cams, spec, fp)
    outs = [
        _sample_tiles_group(
            hm_packed[g], origins, spec, valid, flags, mask, out_dtype,
            planes=emit_planes, fused=fp, cams=cams,
        )
        for g in range(spec.groups)
    ]
    if emit_planes:
        if spec.groups == 1:
            return tuple(outs[0])
        return tuple(
            jnp.concatenate([o[k] for o in outs], axis=1) for k in range(3)
        )
    out = outs[0] if spec.groups == 1 else jnp.concatenate(outs, axis=1)
    return out[:, :, : spec.samples] if spec.samples != s else out


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
    coords (NB, V, 2, S).  Tiles with spread_x <= xw - 9 and
    spread_y <= yw - 9 take the single-window fast path (the -9 is
    bilinear margin 2 + origin quantization 7); larger tiles fall back to
    the exact full-cover loop (ny*nx windows) for that view."""
    spread = coords.max(axis=-1) - coords.min(axis=-1)  # (NB, V, 2)
    return spread[..., 0].max(), spread[..., 1].max()
