"""Sweep the production JLN plane-projection path (pallas) over tile /
window / validity-mode variants on the real chip."""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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


def main():
    import jax
    import jax.numpy as jnp

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.geometry.example_rigs import dome_rig
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.models.projection import (
        compute_crop_origin,
        project_individual_planes_pallas,
    )
    from faster_voxelpose_tpu.ops.pallas_sampling import pack_heatmaps

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs/panoptic/jln64.yaml")
    )
    cfg.NETWORK.SAMPLING_BACKEND = "pallas"
    cfg.NETWORK.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    geom = model.geom
    base = model.sampling_spec

    V = cfg.DATASET.CAMERA_NUM
    W, H = cfg.DATASET.HEATMAP_SIZE
    K = cfg.CAPTURE_SPEC.MAX_PEOPLE
    rng = np.random.RandomState(0)
    hm = (rng.rand(1, V, H, W, 15) * 0.5).astype(np.float32)
    cams = jnp.asarray(dome_rig(1, V))[0]

    centers = rng.uniform(-1200, 1200, (K, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(600, 1100, K)
    tl, _ = compute_crop_origin(geom, jnp.asarray(centers))
    bbox = jnp.asarray(rng.uniform(0.4, 0.9, (K, 2)).astype(np.float32))
    valid = jnp.ones((K,), bool)

    variants = [
        # post-plane-partials sweep: per-sample stage-1 cost is
        # xw*jp*max(yw,128) MACs (the MXU K dim pads to 128), so narrow x
        # windows and x-thin tiles are the remaining levers; the exact
        # cover loop absorbs any tile whose footprint exceeds the window
        ("t8832_w48128 (default)", dict(tile=(8, 8, 32), window_x=48, window_y=128), True),
        ("t8832_w40128", dict(tile=(8, 8, 32), window_x=40, window_y=128), True),
        ("t8832_w32128", dict(tile=(8, 8, 32), window_x=32, window_y=128), True),
        ("t8832_w24128", dict(tile=(8, 8, 32), window_x=24, window_y=128), True),
        ("t8864_w48128", dict(tile=(8, 8, 64), window_x=48, window_y=128), True),
        ("t8864_w32128", dict(tile=(8, 8, 64), window_x=32, window_y=128), True),
        ("t8864_w24128", dict(tile=(8, 8, 64), window_x=24, window_y=128), True),
        ("t4864_w24128", dict(tile=(4, 8, 64), window_x=24, window_y=128), True),
        ("t4864_w16128", dict(tile=(4, 8, 64), window_x=16, window_y=128), True),
        ("t4832_w16128", dict(tile=(4, 8, 32), window_x=16, window_y=128), True),
        ("t8432_w3280", dict(tile=(8, 4, 32), window_x=32, window_y=80), True),
        ("t8832_w4880", dict(tile=(8, 8, 32), window_x=48, window_y=80), True),
        # short-z tiles bound the depth-driven x spread, so narrow x
        # windows keep a high fast fraction (tests the per-z-slab window
        # idea without a kernel rework)
        ("t888_w24128", dict(tile=(8, 8, 8), window_x=24, window_y=128), True),
        ("t888_w32128", dict(tile=(8, 8, 8), window_x=32, window_y=128), True),
        ("t8816_w32128", dict(tile=(8, 8, 16), window_x=32, window_y=128), True),
    ]

    for name, overrides, use_valid in variants:
        spec = dataclasses.replace(base, **overrides)
        try:
            def planes(a, spec=spec, use_valid=use_valid):
                hp = pack_heatmaps(a[0], spec)
                xy, xz, yz = project_individual_planes_pallas(
                    geom, hp, cams, tl, bbox, valid if use_valid else None, spec
                )
                return xy[..., 0]

            t = slope(planes, jnp.asarray(hm))
            print(f"{name:26s}: {t*1e3:7.2f} ms")
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:140]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
