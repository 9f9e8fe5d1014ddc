"""End-to-end throughput benchmark (run by the driver on real TPU).

Measures the headline metric from BASELINE.md: 5-view Panoptic-profile
frames/sec on one chip for the FULL pipeline — ResNet-50 backbone over
five 512x960 views, whole-space back-projection, HDN, per-person JLN.

Methodology: the TPU here sits behind a remote-execution tunnel with
hundreds of ms of per-dispatch overhead, value-caching of identical
dispatches, and opaque scheduling — per-dispatch timing loops measure the
tunnel, not the chip.  So the frame loop runs *inside one dispatch* as a
lax.scan over F distinct staged frames (strict sequential dependence, all
on one chip), the result is fetched (a real fetch cannot lie), and the
per-frame time is the slope between two scan lengths, which cancels
dispatch/fetch/constant overheads.

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
    # persistent compile cache: the two scan-length compiles of the full
    # pipeline dominate wall time through the remote-compile tunnel;
    # repeat runs (driver reruns, tuning iterations) hit the cache
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.geometry.example_rigs import dome_rig
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.models.resnet import build_backbone

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "configs/panoptic/jln64.yaml")
    )
    # worst-case load: force every proposal slot valid so the JLN processes
    # all MAX_PEOPLE people (real scenes skip undetected slots via lax.cond)
    cfg.CAPTURE_SPEC.MIN_SCORE = -1.0
    model = build_model(cfg)
    backbone = build_backbone(cfg)

    V = cfg.DATASET.CAMERA_NUM
    iw, ih = cfg.DATASET.IMAGE_SIZE
    J = cfg.DATASET.NUM_JOINTS
    W, H = cfg.DATASET.HEATMAP_SIZE

    rng = np.random.RandomState(0)
    # realistic Panoptic-like dome rig: bench geometry must be honest —
    # the sampling kernel's window coverage depends on it
    cams = dome_rig(1, V, space_center=cfg.CAPTURE_SPEC.SPACE_CENTER,
                    ori_image_size=cfg.DATASET.ORI_IMAGE_SIZE)
    rngk = jax.random.PRNGKey(0)
    backbone_vars = backbone.init(rngk, np.zeros((1, ih, iw, 3), np.float32))
    variables = model.init(
        rngk, np.zeros((1, V, H, W, J), np.float32), cams, train=False
    )

    def frame_fn(carry, images_v):
        # one streamed frame: (V, ih, iw, 3) -> (K, J, 5)
        hm = backbone.apply(
            backbone_vars, images_v + carry, train=False, mutable=False
        )
        out = model.apply(
            variables, hm[None], jnp.asarray(cams), train=False, mutable=False
        )
        fused = out.fused_poses[0]
        return fused[0, 0, 0] * 1e-30, fused

    def batched_frame_fn(carry, images_bv):
        # throughput mode: B frames in flight through one graph step.
        # (B, V, ih, iw, 3) -> (B, K, J, 5); the backbone sees B*V
        # images as one batch (bigger MXU tiles), the fusion model sees
        # batch B.  Still strictly sequential across scan steps via the
        # scalar carry, so the slope cannot hide pipelining between
        # dispatches — only intra-step batching is measured.
        B = images_bv.shape[0]
        flat = images_bv.reshape((B * V, ih, iw, 3))
        hm = backbone.apply(
            backbone_vars, flat + carry, train=False, mutable=False
        )
        cams_b = jnp.broadcast_to(
            jnp.asarray(cams)[0], (B,) + np.asarray(cams).shape[1:]
        )
        out = model.apply(
            variables,
            hm.reshape((B, V) + hm.shape[1:]),
            cams_b,
            train=False,
            mutable=False,
        )
        fused = out.fused_poses
        return fused[0, 0, 0, 0] * 1e-30, fused

    def make_runner(F, batch=None):
        if batch is None:
            frames = rng.randn(F, V, ih, iw, 3).astype(np.float32)
            fn = frame_fn
        else:
            frames = rng.randn(F, batch, V, ih, iw, 3).astype(np.float32)
            fn = batched_frame_fn

        @jax.jit
        def run(frames):
            _, outs = jax.lax.scan(fn, jnp.float32(0.0), frames)
            return outs

        frames_d = jax.device_put(frames)
        np.asarray(run(frames_d))  # compile + warm
        def timed():
            t0 = time.perf_counter()
            np.asarray(run(frames_d))  # real value fetch
            return time.perf_counter() - t0

        return min(timed() for _ in range(3))

    # latency mode: one frame per step, strict sequential dependence
    F1, F2 = 2, 12
    t1 = make_runner(F1)
    t2 = make_runner(F2)
    per_frame = (t2 - t1) / (F2 - F1)
    fps = 1.0 / per_frame

    # throughput mode: TB frames per step (north-star metric is
    # frames/sec/chip, which a serving deployment achieves by batching)
    TB = int(os.environ.get("BENCH_THROUGHPUT_BATCH", "8"))
    G1, G2 = 1, 4
    tt1 = make_runner(G1, batch=TB)
    tt2 = make_runner(G2, batch=TB)
    per_step = (tt2 - tt1) / (G2 - G1)
    tput_fps = TB / per_step

    print(
        json.dumps(
            {
                "metric": "panoptic_5view_e2e_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "throughput_fps": round(tput_fps, 2),
                "throughput_batch": TB,
            }
        )
    )


if __name__ == "__main__":
    main()
