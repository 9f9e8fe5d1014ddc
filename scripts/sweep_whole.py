"""Sweep the whole-space (HDN) Pallas projection over tile/window
variants on the real chip: per-variant slope timing, bf16 parity vs the
quad path, and the host-computed fast-path rate (fraction of (tile,view)
blocks whose anchored window covers their footprint — the rest loop over
the exact full-image cover).

Usage: python scripts/sweep_whole.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def slope(run, args, n1=2, n2=10):
    import jax
    import jax.numpy as jnp

    def timed(n):
        @jax.jit
        def wrapped(a):
            def body(c, _):
                out = run(jax.tree.map(lambda x: x + c * 1e-30, a))
                ss = (jnp.sum(out) * 1e-30).astype(jnp.float32)
                return ss, ss

            _, o = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return o

        np.asarray(wrapped(args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(wrapped(args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(n2) - timed(n1)) / (n2 - n1)


def fast_rate(geom, cams, spec):
    """Host replay of the kernel's per-(tile,view) fast/slow decision."""
    import jax
    import jax.numpy as jnp

    from faster_voxelpose_tpu.geometry.grids import project_to_norm_coords
    from faster_voxelpose_tpu.ops.pallas_sampling import tile_offsets_np

    vx, vy, vz = geom.voxels_per_axis
    offs = tile_offsets_np((vx, vy, vz), spec.tile)
    grid = geom.whole_grid.reshape(vx, vy, vz, 3)[offs[:, 0], offs[:, 1], offs[:, 2]]
    w, h = geom.heatmap_size
    rt = jnp.asarray(geom.resize_transform, jnp.float32)

    def per_view(cam):
        norm = project_to_norm_coords(
            jnp.asarray(grid, jnp.float32), cam, rt, geom.ori_image_size,
            geom.image_size, geom.heatmap_size,
        )
        return (norm + 1.0) * 0.5 * jnp.asarray([w - 1, h - 1], jnp.float32)

    pix = np.asarray(jax.vmap(per_view)(cams))  # (V, N, 2)
    s = spec.samples
    nb = pix.shape[1] // s
    pix = pix.reshape(len(pix), nb, s, 2)

    def axis_ok(v, dim, wlen, pdim):
        lo = np.floor(v)
        hi = lo + 1
        nonempty = (hi >= 0) & (lo <= dim - 1)
        cov_lo = np.where(nonempty, np.maximum(lo, 0), dim)
        cov_hi = np.where(nonempty, np.minimum(hi, dim - 1), -1)
        a = cov_lo.min(axis=-1)
        b = cov_hi.max(axis=-1)
        o = (np.clip(a, 0, pdim - wlen).astype(int) // 8) * 8
        return b <= o + wlen - 1

    okx = axis_ok(pix[..., 0], spec.width, spec.xw, spec.wp)
    oky = axis_ok(pix[..., 1], spec.height, spec.yw, spec.hp)
    return float((okx & oky).mean())


def main():
    import jax
    import jax.numpy as jnp

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.geometry.example_rigs import dome_rig
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.models.projection import (
        project_whole,
        project_whole_pallas,
    )
    from faster_voxelpose_tpu.ops.pallas_sampling import pack_heatmaps
    from faster_voxelpose_tpu.ops.sampling import build_quad_table

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs/panoptic/jln64.yaml")
    )
    cfg.NETWORK.SAMPLING_BACKEND = "pallas"
    model = build_model(cfg)
    geom = model.geom
    base = model.whole_sampling_spec or model.sampling_spec

    V = cfg.DATASET.CAMERA_NUM
    W, H = cfg.DATASET.HEATMAP_SIZE
    rng = np.random.RandomState(0)
    hm = (rng.rand(V, H, W, 15) * 0.8).astype(np.float32)
    cams = jnp.asarray(dome_rig(1, V))[0]

    quads = jax.jit(jax.vmap(build_quad_table))(jnp.asarray(hm))
    ref = np.asarray(jax.jit(lambda q, c: project_whole(geom, q, c))(quads, cams))

    variants = [
        ("t4420_w64_yfull", dict(tile=(4, 4, 20), window_x=64, window_y=1024)),
        ("t4420_w80_yfull", dict(tile=(4, 4, 20), window_x=80, window_y=1024)),
        ("t4420_w120_yfull", dict(tile=(4, 4, 20), window_x=120, window_y=1024)),
        ("t4420_w120_y64", dict(tile=(4, 4, 20), window_x=120, window_y=64)),
        ("t884_w64_y64", dict(tile=(8, 8, 4), window_x=64, window_y=64)),
        ("t884_w48_y48", dict(tile=(8, 8, 4), window_x=48, window_y=48)),
        ("t8810_w80_y80", dict(tile=(8, 8, 10), window_x=80, window_y=80)),
        ("t8820_w64_yfull", dict(tile=(8, 8, 20), window_x=64, window_y=1024)),
        ("t4410_w64_y80", dict(tile=(4, 4, 10), window_x=64, window_y=80)),
    ]

    for name, overrides in variants:
        spec = dataclasses.replace(base, **overrides)
        try:
            rate = fast_rate(geom, cams, spec)
            hp = pack_heatmaps(jnp.asarray(hm), spec)
            out = np.asarray(
                jax.jit(lambda h, c: project_whole_pallas(geom, h, c, spec))(hp, cams)
            )
            err = np.abs(out - ref).max()
            t = slope(lambda a: project_whole_pallas(geom, a, cams, spec)[..., 0], hp)
            print(f"{name:20s}: {t*1e3:6.2f} ms  err {err:.1e}  fast-rate {rate:.3f}")
        except Exception as e:
            print(f"{name:20s}: FAILED {str(e)[:160]}")
        sys.stdout.flush()

    tq = slope(
        lambda a: project_whole(geom, jax.vmap(build_quad_table)(a), cams)[..., 0],
        jnp.asarray(hm),
    )
    print(f"{'quad+table':20s}: {tq*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
