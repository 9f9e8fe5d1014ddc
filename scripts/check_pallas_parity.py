"""On-chip validation of the Pallas sampling path: full-model pallas-vs-
quad parity at a real profile with realistic cameras, plus per-variant
frame timing (scan-slope method).

Usage: python scripts/check_pallas_parity.py [--cfg CONFIG.yaml]
           [--only=name1,name2] [--no-timing]

Default profile is Panoptic (dome rig); --cfg configs/campus/jln64.yaml
switches to the Campus geometry (12x12m space, 3 perimeter cameras,
200x160 heatmaps) with the matching wide-baseline rig.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def dome_cameras(B, V, seed=100):
    from faster_voxelpose_tpu.geometry.example_rigs import dome_rig

    return dome_rig(B, V, seed=seed)


def structured_heatmaps(rng, B, V, H, W, J):
    hm = rng.rand(B, V, H, W, J).astype(np.float32) * 0.2
    yy, xx = np.mgrid[0:H, 0:W]
    for b in range(B):
        for v in range(V):
            for _ in range(8):
                cx_, cy_ = rng.uniform(20, W - 20), rng.uniform(10, H - 10)
                j = rng.randint(J)
                blob = np.exp(
                    -((xx - cx_) ** 2 + (yy - cy_) ** 2) / (2 * 4.0**2)
                )
                hm[b, v, :, :, j] = np.maximum(hm[b, v, :, :, j], blob)
    return hm


def main():
    import jax
    import jax.numpy as jnp

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.models.faster_voxelpose import (
        build_model,
        resolve_sampling_spec,
    )

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs/panoptic/jln64.yaml"
    )
    for a in sys.argv:
        if a.startswith("--cfg="):
            cfg_path = a.split("=", 1)[1]
    if "--cfg" in sys.argv:
        i = sys.argv.index("--cfg")
        if i + 1 >= len(sys.argv):
            sys.exit("usage: --cfg <experiment.yaml> (value missing)")
        cfg_path = sys.argv[i + 1]
    cfg = load_config(cfg_path)
    cfg.CAPTURE_SPEC.MIN_SCORE = -1.0  # all K slots valid: worst-case load
    cfg.NETWORK.COMPUTE_DTYPE = "float32"

    V = cfg.DATASET.CAMERA_NUM
    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    rng = np.random.RandomState(0)
    heatmaps = structured_heatmaps(rng, 1, V, H, W, J)
    # rig must match the profile's geometry: wide-baseline perimeter
    # cameras for the big Campus space, dome otherwise
    if max(cfg.CAPTURE_SPEC.SPACE_SIZE[:2]) > 9000:
        from faster_voxelpose_tpu.geometry.example_rigs import perimeter_rig

        cams = perimeter_rig(
            1, V,
            space_center=cfg.CAPTURE_SPEC.SPACE_CENTER,
            ori_image_size=cfg.DATASET.ORI_IMAGE_SIZE,
        )
    else:
        from faster_voxelpose_tpu.geometry.example_rigs import dome_rig

        cams = dome_rig(
            1, V,
            space_center=cfg.CAPTURE_SPEC.SPACE_CENTER,
            ori_image_size=cfg.DATASET.ORI_IMAGE_SIZE,
        )

    results = {}
    variants = [
        ("quad", dict(SAMPLING_BACKEND="quad")),
        ("pallas_exact", dict(SAMPLING_BACKEND="pallas", PALLAS_EXACT=True)),
        ("pallas_fast", dict(SAMPLING_BACKEND="pallas", PALLAS_EXACT=False)),
        (
            "pallas_fast_t888",
            dict(SAMPLING_BACKEND="pallas", PALLAS_EXACT=False,
                 PALLAS_TILE=(8, 8, 8), PALLAS_WINDOW=(32, 40)),
        ),
        (
            "pallas_fast_t888_w4048",
            dict(SAMPLING_BACKEND="pallas", PALLAS_EXACT=False,
                 PALLAS_TILE=(8, 8, 8), PALLAS_WINDOW=(40, 48)),
        ),
        (
            "pallas_fast_t4416",
            dict(SAMPLING_BACKEND="pallas", PALLAS_EXACT=False,
                 PALLAS_TILE=(4, 4, 16), PALLAS_WINDOW=(24, 48)),
        ),
        # bf16 conv-stack validation at the full profile (VERDICT weak #2):
        # fused-pose delta vs the all-f32 quad baseline
        (
            "pallas_fast_bf16",
            dict(SAMPLING_BACKEND="pallas", PALLAS_EXACT=False,
                 COMPUTE_DTYPE="bfloat16"),
        ),
        # whole-space projection through the kernel too (detection impact
        # of the frustum-shell deviation)
        (
            "pallas_whole",
            dict(SAMPLING_BACKEND="pallas", PALLAS_EXACT=False,
                 PALLAS_WHOLE=True),
        ),
        # production defaults (config.py: tile (8,8,32), window (40,128),
        # whole-space kernel ON) and the same + fused in-kernel
        # voxel->pixel projection (no XLA coords pass for the JLN)
        (
            "pallas_prod",
            dict(SAMPLING_BACKEND="pallas", PALLAS_EXACT=False,
                 PALLAS_TILE=(8, 8, 32), PALLAS_WINDOW=(40, 128),
                 PALLAS_WHOLE=True),
        ),
        (
            "pallas_fused",
            dict(SAMPLING_BACKEND="pallas", PALLAS_EXACT=False,
                 PALLAS_TILE=(8, 8, 32), PALLAS_WINDOW=(40, 128),
                 PALLAS_WHOLE=True, PALLAS_FUSED_COORDS=True),
        ),
        (
            "pallas_fused_exact",
            dict(SAMPLING_BACKEND="pallas", PALLAS_EXACT=True,
                 PALLAS_TILE=(8, 8, 32), PALLAS_WINDOW=(40, 128),
                 PALLAS_WHOLE=True, PALLAS_FUSED_COORDS=True),
        ),
        # fused-coords window sweep: in-kernel projection shifts the
        # cost balance (no per-sample coords tensor, VPU projects per
        # window sample), so the (40, 128) default swept for the
        # non-fused kernel may no longer be optimal
        (
            "pallas_fused_w32128",
            dict(SAMPLING_BACKEND="pallas", PALLAS_EXACT=False,
                 PALLAS_TILE=(8, 8, 32), PALLAS_WINDOW=(32, 128),
                 PALLAS_WHOLE=True, PALLAS_FUSED_COORDS=True),
        ),
        (
            "pallas_fused_w48128",
            dict(SAMPLING_BACKEND="pallas", PALLAS_EXACT=False,
                 PALLAS_TILE=(8, 8, 32), PALLAS_WINDOW=(48, 128),
                 PALLAS_WHOLE=True, PALLAS_FUSED_COORDS=True),
        ),
        (
            "pallas_fused_w4096",
            dict(SAMPLING_BACKEND="pallas", PALLAS_EXACT=False,
                 PALLAS_TILE=(8, 8, 32), PALLAS_WINDOW=(40, 96),
                 PALLAS_WHOLE=True, PALLAS_FUSED_COORDS=True),
        ),
    ]
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    if only:
        variants = [v for v in variants if v[0] in only[0].split(",")]
    defaults = dict(
        SAMPLING_BACKEND="quad", PALLAS_EXACT=False,
        PALLAS_WINDOW=(40, 48), PALLAS_TILE=(8, 8, 8),
        PALLAS_WHOLE=False, COMPUTE_DTYPE="float32",
        PALLAS_FUSED_COORDS=False,
    )
    variables = None
    for name, overrides in variants:
        for k, val in {**defaults, **overrides}.items():
            setattr(cfg.NETWORK, k, val)
        model = build_model(cfg)
        print(f"{name}: spec={model.sampling_spec}", file=sys.stderr)
        if variables is None:
            variables = model.init(
                jax.random.PRNGKey(0), heatmaps, cams, train=False
            )

        @jax.jit
        def fwd(variables, hm, cams):
            out = model.apply(variables, hm, cams, train=False, mutable=False)
            return out.fused_poses, out.proposal_centers

        fused, centers = jax.block_until_ready(fwd(variables, heatmaps, cams))
        results[name] = (np.asarray(fused), np.asarray(centers))
        print(f"{name}: forward ok", flush=True)

        if "--no-timing" in sys.argv:
            continue

        # frame time via scan slope
        def make_runner(F):
            frames = rng.rand(F, *heatmaps.shape[1:]).astype(np.float32) * 0.5

            @jax.jit
            def run(frames):
                def body(c, hm):
                    f, _ = fwd(variables, hm[None] + c * 1e-30, cams)
                    ss = (jnp.sum(f[..., :1]) * 1e-30).astype(jnp.float32)
                    return ss, ss

                _, o = jax.lax.scan(body, jnp.float32(0.0), frames)
                return o

            fd = jax.device_put(frames)
            np.asarray(run(fd))
            return min(
                (lambda t0: (np.asarray(run(fd)), time.perf_counter() - t0)[1])(
                    time.perf_counter()
                )
                for _ in range(3)
            )

        t1, t2 = make_runner(2), make_runner(10)
        ms = (t2 - t1) / 8 * 1e3
        print(f"{name}: {ms:.1f} ms/frame (heatmaps->poses, K=10 forced)")
        results[name + "_ms"] = ms
        sys.stdout.flush()

    if "quad" not in results:
        return
    for name in [n for n, _ in variants if n != "quad" and n in results]:
        fq, cq = results["quad"]
        fp, cp = results[name]
        agree = np.all(np.abs(cp[:, :, :3] - cq[:, :, :3]) < 1e-2, axis=-1)
        dmax = np.abs(fp[agree][:, :, :3] - fq[agree][:, :, :3]).max()
        print(
            f"{name} vs quad: proposal agreement {agree.mean():.3f}, "
            f"max fused-pose delta {dmax:.4f} mm"
        )


if __name__ == "__main__":
    main()
