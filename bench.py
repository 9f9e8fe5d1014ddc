"""End-to-end throughput benchmark (run by the driver on real TPU).

Measures the headline metric from BASELINE.md: 5-view Panoptic-profile
frames/sec on one chip for the FULL pipeline — ResNet-50 backbone over
five 512x960 views, whole-space back-projection, HDN, per-person JLN —
as one jit graph.  Baseline: the paper's ~31 FPS single-GPU real-time
claim (BASELINE.md: "Throughput").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 31.0  # paper-class single-GPU "real-time" throughput


def main():
    import jax

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.models.resnet import build_backbone
    from __graft_entry__ import _example_cameras

    cfg = load_config(os.path.join(os.path.dirname(__file__), "configs/panoptic/jln64.yaml"))

    model = build_model(cfg)
    backbone = build_backbone(cfg)

    B, V = 1, cfg.DATASET.CAMERA_NUM
    iw, ih = cfg.DATASET.IMAGE_SIZE
    J = cfg.DATASET.NUM_JOINTS

    rng = np.random.RandomState(0)
    images = rng.randn(B, V, ih, iw, 3).astype(np.float32)
    cams = _example_cameras(B, V)
    # plausible in-space camera rig for the panoptic capture volume
    rngk = jax.random.PRNGKey(0)
    backbone_vars = backbone.init(rngk, np.zeros((1, ih, iw, 3), np.float32))

    W, H = cfg.DATASET.HEATMAP_SIZE
    variables = model.init(
        rngk, np.zeros((B, V, H, W, J), np.float32), cams, train=False
    )

    @jax.jit
    def pipeline(variables, backbone_vars, images, cams):
        flat = images.reshape((B * V, ih, iw, 3))
        hm = backbone.apply(backbone_vars, flat, train=False, mutable=False)
        heatmaps = hm.reshape((B, V) + hm.shape[1:])
        out = model.apply(variables, heatmaps, cams, train=False, mutable=False)
        return out.fused_poses

    images_d = jax.device_put(images)
    cams_d = jax.device_put(cams)

    # warmup / compile
    jax.block_until_ready(pipeline(variables, backbone_vars, images_d, cams_d))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(variables, backbone_vars, images_d, cams_d)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = iters * B / dt
    print(
        json.dumps(
            {
                "metric": "panoptic_5view_e2e_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
