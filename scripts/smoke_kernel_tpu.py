"""On-chip smoke + parity for the round-3 sampling kernel rewrite.

Checks, on the real TPU (Mosaic lowering, not the interpreter):
  1. fast-path parity vs the XLA quad reference (compact tiles)
  2. slow-path parity with wild coords that force the full-cover loop
  3. joint-group parity at the COCO-17 Shelf profile (200x152, 2 groups)
  4. whole-space projection parity vs quad incl. a 0.8m near camera
  5. slope timings for the JLN crop pass and the whole-space pass

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache python scripts/smoke_kernel_tpu.py [--quick]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp


def slope(run, args, n1=2, n2=10):
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


def xla_reference(hm, coords, spec):
    from faster_voxelpose_tpu.ops.sampling import bilinear_sample

    W, H, J = spec.width, spec.height, spec.num_joints
    x, y = coords[:, :, 0, :], coords[:, :, 1, :]
    c = jnp.stack([x / (W - 1) * 2 - 1, y / (H - 1) * 2 - 1], axis=-1)
    vals = jax.vmap(lambda cv: jax.vmap(bilinear_sample, (0, 0))(hm, cv))(c)
    out = jnp.clip(jnp.mean(vals, axis=1), 0.0, 1.0)
    out = jnp.pad(out, ((0, 0), (0, 0), (0, spec.jp_total - J)))
    return out.transpose(0, 2, 1)


def check(name, spec, nb, jitter, wild_every=None, seed=0):
    from faster_voxelpose_tpu.ops.pallas_sampling import (
        pack_heatmaps,
        sample_tiles,
    )

    rng = np.random.RandomState(seed)
    hm = rng.rand(spec.n_views, spec.height, spec.width, spec.num_joints)
    hm = hm.astype(np.float32)
    s = spec.samples
    centers = np.stack(
        [
            rng.uniform(-6, spec.width + 6, (nb, spec.n_views, 1)),
            rng.uniform(-6, spec.height + 6, (nb, spec.n_views, 1)),
        ],
        axis=2,
    )
    coords = centers + rng.uniform(-jitter, jitter, (nb, spec.n_views, 2, s))
    if wild_every:
        for b in range(0, nb, wild_every):
            coords[b, :, 0, :] = rng.uniform(-8, spec.width + 8, (spec.n_views, s))
            coords[b, :, 1, :] = rng.uniform(-8, spec.height + 8, (spec.n_views, s))
    coords = coords.astype(np.float32)

    hp = pack_heatmaps(jnp.asarray(hm), spec)
    ours = np.asarray(
        jax.jit(lambda h, c: sample_tiles(h, c, spec))(hp, jnp.asarray(coords))
    )
    ref = np.asarray(xla_reference(jnp.asarray(hm), jnp.asarray(coords), spec))
    err = np.abs(ours - ref).max()
    # exact mode = HIGHEST MXU passes: ~1e-5 vs the differently-ordered
    # XLA reference reduction; fast mode = bf16 products (~4e-3)
    print(f"{name}: max err {err:.2e} "
          f"({'OK' if err < (2e-5 if spec.exact else 5e-3) else 'FAIL'})")
    sys.stdout.flush()
    return err


def main():
    quick = "--quick" in sys.argv
    from faster_voxelpose_tpu.ops.pallas_sampling import SampleKernelSpec

    print("backend:", jax.default_backend(), jax.devices())

    # 1+2: Panoptic JLN profile, exact mode, fast + wild
    spec = SampleKernelSpec(
        n_views=5, height=128, width=240, num_joints=15,
        tile=(8, 8, 8), window_x=40, window_y=48, exact=True,
    )
    check("jln exact fast", spec, nb=64, jitter=8)
    check("jln exact wild(slow path)", spec, nb=64, jitter=8, wild_every=4)

    # fast mode (bf16 + selector MXU)
    specf = dataclasses.replace(spec, exact=False)
    check("jln bf16 fast", specf, nb=64, jitter=8)
    check("jln bf16 wild", specf, nb=64, jitter=8, wild_every=4)

    # 3: COCO-17 Shelf profile (2 joint groups)
    spec17 = SampleKernelSpec(
        n_views=5, height=152, width=200, num_joints=17,
        tile=(8, 8, 8), window_x=40, window_y=48, exact=True,
    )
    check("shelf17 exact", spec17, nb=64, jitter=8, wild_every=8)

    # whole-space spec shape (full-z pillars, full-height y window)
    specw = SampleKernelSpec(
        n_views=5, height=128, width=240, num_joints=15,
        tile=(4, 4, 20), window_x=64, window_y=1024, exact=True,
    )
    check("whole exact wild", specw, nb=40, jitter=20, wild_every=3)

    if quick:
        return

    # 4: whole-space projection vs quad with a 0.8m camera
    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.geometry.example_rigs import dome_rig
    from faster_voxelpose_tpu.geometry.cameras import pack_rig
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
    wspec = model.whole_sampling_spec
    print("resolved whole spec:", wspec)

    rng = np.random.RandomState(1)
    hm = (rng.rand(5, 128, 240, 15) * 0.8).astype(np.float32)
    cams = np.asarray(dome_rig(1, 5))[0].copy()
    center = np.asarray(cfg.CAPTURE_SPEC.SPACE_CENTER)
    cams[0] = pack_rig(
        [
            {
                "R": np.eye(3),
                "T": (center + np.array([0.0, -800.0, 600.0]))[:, None],
                "fx": 1500.0, "fy": 1500.0, "cx": 960.0, "cy": 540.0,
                "k": np.zeros((3, 1)), "p": np.zeros((2, 1)),
            }
        ]
    )[0]
    cams = jnp.asarray(cams.astype(np.float32))

    wspec_exact = dataclasses.replace(wspec, exact=True)
    quads = jax.jit(jax.vmap(build_quad_table))(jnp.asarray(hm))
    ref = np.asarray(jax.jit(lambda q, c: project_whole(geom, q, c))(quads, cams))
    hp = pack_heatmaps(jnp.asarray(hm), wspec_exact)
    ours = np.asarray(
        jax.jit(lambda h, c: project_whole_pallas(geom, h, c, wspec_exact))(hp, cams)
    )
    werr = np.abs(ours - ref).max()
    print(f"whole-space vs quad (0.8m cam, exact): max err {werr:.2e} "
          f"({'OK' if werr < 1e-3 else 'FAIL'})")

    hpf = pack_heatmaps(jnp.asarray(hm), wspec)
    oursf = np.asarray(
        jax.jit(lambda h, c: project_whole_pallas(geom, h, c, wspec))(hpf, cams)
    )
    werrf = np.abs(oursf - ref).max()
    print(f"whole-space vs quad (0.8m cam, bf16): max err {werrf:.2e}")

    # 5: timings
    t = slope(
        lambda a: project_whole_pallas(geom, a, cams, wspec)[..., 0], hpf
    )
    print(f"whole-space pallas bf16 (default spec): {t*1e3:.2f} ms")
    tq = slope(
        lambda a: project_whole(geom, jax.vmap(build_quad_table)(a), cams)[..., 0],
        jnp.asarray(hm),
    )
    print(f"whole-space quad (incl. table build): {tq*1e3:.2f} ms")


if __name__ == "__main__":
    main()
