"""Capture a jax.profiler trace of the e2e bench pipeline on the chip.

Usage: python scripts/capture_trace.py [logdir] [F]

Runs the same staged-frame scan as bench.py (backbone -> full model,
K=10 forced) once to warm/compile, then once under jax.profiler.trace.
Analyze with scripts/analyze_trace.py <logdir>.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.geometry.example_rigs import dome_rig
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.models.resnet import build_backbone

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs/panoptic/jln64.yaml")
    )
    cfg.CAPTURE_SPEC.MIN_SCORE = -1.0
    model = build_model(cfg)
    backbone = build_backbone(cfg)

    V = cfg.DATASET.CAMERA_NUM
    iw, ih = cfg.DATASET.IMAGE_SIZE
    J = cfg.DATASET.NUM_JOINTS
    W, H = cfg.DATASET.HEATMAP_SIZE

    rng = np.random.RandomState(0)
    cams = dome_rig(1, V, space_center=cfg.CAPTURE_SPEC.SPACE_CENTER,
                    ori_image_size=cfg.DATASET.ORI_IMAGE_SIZE)
    rngk = jax.random.PRNGKey(0)
    backbone_vars = backbone.init(rngk, np.zeros((1, ih, iw, 3), np.float32))
    variables = model.init(
        rngk, np.zeros((1, V, H, W, J), np.float32), cams, train=False
    )

    def frame_fn(carry, images_v):
        hm = backbone.apply(
            backbone_vars, images_v + carry, train=False, mutable=False
        )
        out = model.apply(
            variables, hm[None], jnp.asarray(cams), train=False, mutable=False
        )
        fused = out.fused_poses[0]
        return fused[0, 0, 0] * 1e-30, fused

    frames = rng.randn(F, V, ih, iw, 3).astype(np.float32)

    @jax.jit
    def run(frames):
        _, outs = jax.lax.scan(frame_fn, jnp.float32(0.0), frames)
        return outs

    frames_d = jax.device_put(frames)
    np.asarray(run(frames_d))  # compile + warm
    with jax.profiler.trace(logdir):
        np.asarray(run(frames_d))
    print(f"trace written under {logdir} (F={F} frames)")


if __name__ == "__main__":
    main()
