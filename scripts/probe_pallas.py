"""On-chip probes for the Pallas bilinear-sampling kernel design.

The JLN's 13.1M bilinear samples/frame run at the XLA gather engine's
issue rate (~10ns/sample -> 145ms/frame, docs/DESIGN.md).  The kernel
probed here reformulates the gather as dense math: samples are processed
in blocks that share a small heatmap window (voxel blocks project to
compact image footprints), the x-interpolation is one MXU matmul against
the window, and the y-interpolation is a lane-parallel VPU contraction.
No per-element gathers anywhere.

Run on the real chip:  python scripts/probe_pallas.py
Timing uses the scan-slope method from bench.py (the chip sits behind a
high-latency dispatch tunnel; only slopes between two in-dispatch
iteration counts are trustworthy).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Panoptic JLN profile
V, J, W, H = 5, 15, 240, 128
JP = 16  # J padded to a sublane multiple
K = 10
CUBE = 64 * 64 * 64

S = 256  # samples per kernel block
# window sizes: Mosaic requires dynamic-slice offsets provably 8-aligned
# on the sublane dim and 128-aligned on lanes, so window origins are
# quantized down to multiples of 8 and the windows widened to compensate:
# guaranteed pixel-spread coverage is XW-9 / YW-9 per block.
XW = 24  # window width  (x, sublanes of the table slice; multiple of 8)
YW = 24  # window height (y, lane groups; YW*JP must be a multiple of 128)


def _sample_kernel(coords_ref, hm_ref, out_ref, *, n_views, xw, yw, jp, w, h):
    """One block: S samples x V views -> camera-averaged (JP, S) values.

    coords_ref: (V, 2, S) f32 pixel coords (x; y) of this block's samples
    hm_ref:     (V, W, H*JP) f32, lane layout y-major j-minor
    out_ref:    (JP, S) f32
    """
    acc = jnp.zeros((jp, S), jnp.float32)
    for v in range(n_views):
        x = coords_ref[v, 0, :]  # (S,)
        y = coords_ref[v, 1, :]
        # window origin: floor(min)-quantized to 8 for aligned slicing
        ox = jnp.clip(jnp.floor(jnp.min(x)), 0.0, float(w - xw)).astype(jnp.int32)
        oy = jnp.clip(jnp.floor(jnp.min(y)), 0.0, float(h - yw)).astype(jnp.int32)
        ox = pl.multiple_of((ox // 8) * 8, 8)
        oy = pl.multiple_of((oy // 8) * 8, 8)

        oy_lane = pl.multiple_of(oy * jp, 128)  # oy % 8 == 0 and jp == 16
        win = hm_ref[v, pl.ds(ox, xw), pl.ds(oy_lane, yw * jp)]  # (XW, YW*JP)

        # separable bilinear weights by distance (== zeros-padding
        # align_corners bilinear when the window covers every in-image
        # pixel within distance 1 of each sample; window clipping to the
        # image implements the out-of-bounds zero contribution)
        xi = jax.lax.broadcasted_iota(jnp.int32, (xw, S), 0).astype(
            jnp.float32
        ) + ox.astype(jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[None, :] - xi))  # (XW, S)
        yi = jax.lax.broadcasted_iota(jnp.int32, (yw, S), 0).astype(
            jnp.float32
        ) + oy.astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[None, :] - yi))  # (YW, S)

        # x-interpolation on the MXU: contract the window's x axis
        t = jax.lax.dot_general(
            win,
            wx,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # f32 parity (bf16 MXU
            # passes cost ~6e-4 abs error, too coarse vs the reference)
        )  # (YW*JP, S), rows y-major j-minor

        # y-interpolation on the VPU: t rows are y-major j-minor, so a
        # (yw, jp, S) view broadcast-multiplied by wy contracts y
        p = t.reshape(yw, jp, S) * wy[:, None, :]
        acc = acc + jnp.sum(p, axis=0)

    out_ref[:, :] = jnp.clip(acc * (1.0 / n_views), 0.0, 1.0)


def _kernel_wrapper(coords_ref, hm_ref, out_ref, **kw):
    # coords block arrives (1, V, 2, S); drop the leading grid dim
    _sample_kernel(coords_ref.at[0], hm_ref, out_ref.at[0], **kw)


import os

INTERPRET = (
    os.environ.get("PALLAS_INTERPRET", "") == "1"
    or jax.default_backend() == "cpu"
)


def pallas_sample_fixed(hm_packed, coords):
    n_blocks = coords.shape[0]
    kern = functools.partial(
        _kernel_wrapper, n_views=V, xw=XW, yw=YW, jp=JP, w=W, h=H
    )
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, V, 2, S), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, JP, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks, JP, S), jnp.float32),
        interpret=INTERPRET,
    )(coords, hm_packed)


# ---------------------------------------------------------------------------
# reference + data
# ---------------------------------------------------------------------------


def make_block_coords(n_blocks, rng, spread=10.0):
    """Per-block coherent pixel coordinates: block center anywhere in/near
    the image, samples within `spread` px of it (mimics 4x4x4-voxel crop
    blocks)."""
    centers = np.stack(
        [
            rng.uniform(-10, W + 10, (n_blocks, V, 1, 1)),
            rng.uniform(-10, H + 10, (n_blocks, V, 1, 1)),
        ],
        axis=2,
    ).reshape(n_blocks, V, 2, 1)
    jitter = rng.uniform(-spread / 2, spread / 2, (n_blocks, V, 2, S))
    return (centers + jitter).astype(np.float32)


def xla_reference(hm, coords):
    """Plain-XLA bilinear zeros-padding sample for correctness checking.
    hm (V, H, W, J); coords (n, V, 2, S) pixels -> (n, JP, S)."""
    from faster_voxelpose_tpu.ops.sampling import bilinear_sample

    n = coords.shape[0]
    x = coords[:, :, 0, :]
    y = coords[:, :, 1, :]
    xn = x / (W - 1) * 2 - 1
    yn = y / (H - 1) * 2 - 1
    c = jnp.stack([xn, yn], axis=-1)  # (n, V, S, 2)
    vals = jax.vmap(
        lambda cv: jax.vmap(bilinear_sample, in_axes=(0, 0))(hm, cv)
    )(c)  # (n, V, S, J)
    out = jnp.clip(jnp.mean(vals, axis=1), 0.0, 1.0)  # (n, S, J)
    out = jnp.pad(out, ((0, 0), (0, 0), (0, JP - J)))
    return out.transpose(0, 2, 1)  # (n, JP, S)


def pack_hm(hm):
    """(V, H, W, J) -> (V, W, H*JP), lanes y-major j-minor."""
    hmp = jnp.pad(hm, ((0, 0), (0, 0), (0, 0), (0, JP - J)))
    return hmp.transpose(0, 2, 1, 3).reshape(V, W, H * JP)


# ---------------------------------------------------------------------------
# timing
# ---------------------------------------------------------------------------


def slope_time(fn, arg_fn, iters=(2, 8)):
    """Per-iteration seconds via the scan-slope method."""

    def runner(n):
        args = arg_fn()

        @jax.jit
        def run(a):
            def body(carry, _):
                out = fn(jax.tree.map(lambda x: x + carry * 1e-30, a))
                s = (jnp.sum(out[..., :1]) * 1e-30).astype(jnp.float32)
                return s, s  # scalar per step: nothing big is stacked

            _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return outs

        np.asarray(run(args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = runner(iters[0]), runner(iters[1])
    return (t2 - t1) / (iters[1] - iters[0])


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.RandomState(0)
    hm = rng.rand(V, H, W, J).astype(np.float32)
    hm_d = jax.device_put(jnp.asarray(hm))
    hm_packed = jax.jit(pack_hm)(hm_d)

    # correctness at small scale
    n_small = 64
    coords = make_block_coords(n_small, rng)
    coords_d = jax.device_put(jnp.asarray(coords))
    ours = np.asarray(jax.jit(pallas_sample_fixed)(hm_packed, coords_d))
    ref = np.asarray(jax.jit(xla_reference)(hm_d, coords_d))
    err = np.abs(ours - ref).max()
    print(f"correctness max|err| = {err:.3e}")
    assert err < 1e-5, "kernel mismatch"

    # throughput at JLN scale: K people x 64^3 voxels
    n_blocks = K * CUBE // S  # 10240
    big = make_block_coords(n_blocks, rng)
    big_d = jax.device_put(jnp.asarray(big))

    t_pallas = slope_time(
        lambda a: pallas_sample_fixed(hm_packed, a), lambda: big_d
    )
    n_samples = n_blocks * S * V
    print(
        f"pallas: {t_pallas*1e3:.2f} ms for {n_samples/1e6:.1f}M samples "
        f"({t_pallas/n_samples*1e9:.3f} ns/sample)"
    )

    # baseline: current quad-table XLA gather at the same scale
    from faster_voxelpose_tpu.ops.sampling import (
        bilinear_sample_quad,
        build_quad_table_views,
    )

    quads = jax.jit(build_quad_table_views)(hm_d)
    coords_flat = big_d.transpose(1, 0, 3, 2).reshape(V, -1, 2)  # (V, N, 2)
    norm = coords_flat / jnp.asarray([W - 1, H - 1]) * 2 - 1

    def quad_fn(c):
        vals = jax.vmap(lambda q, cc: bilinear_sample_quad(q, cc, H, W))(
            quads, c
        )
        return jnp.clip(jnp.mean(vals, axis=0), 0, 1)

    t_quad = slope_time(quad_fn, lambda: norm)
    print(
        f"quad-gather: {t_quad*1e3:.2f} ms ({t_quad/n_samples*1e9:.3f} ns/sample)"
    )
    print(f"speedup: {t_quad/t_pallas:.1f}x")


if __name__ == "__main__":
    main()
