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

    payload = {
        "metric": "panoptic_5view_e2e_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "throughput_fps": round(tput_fps, 2),
        "throughput_batch": TB,
    }
    try:
        payload.update(realistic_bench(TB))
    except Exception as e:  # realistic mode is additive; never sink the headline
        payload["realistic_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(payload))


def realistic_bench(TB: int) -> dict:
    """Deployment-realistic load with the TRAINED detector: the committed
    Panoptic-profile checkpoint (checkpoints/panoptic_synthetic/
    model_best.npz) at its default MIN_SCORE on synthetic scenes with a
    known people count — the regime a real deployment pays, vs the
    headline's K=10-forced worst case that no real frame ever hits.

    Two honest flavors:
    * realistic_e2e_*: full pipeline — ResNet-50 over five 512x960 views
      PLUS trained fusion.  The backbone contributes timing only (its
      training needs real images, environment-blocked); detection counts
      come from the trained detector on held-out synthetic heatmaps.
    * realistic_fusion_*: heatmaps -> poses, the reference's own
      operating mode on Shelf/Campus (precomputed heatmaps).
    """
    import subprocess
    import time as _time

    import jax
    import jax.numpy as jnp

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.datasets import get_dataset
    from faster_voxelpose_tpu.engine.checkpoint import load_best_npz
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.models.resnet import build_backbone

    repo = os.path.dirname(os.path.abspath(__file__))
    snap = os.path.join(repo, "checkpoints", "panoptic_synthetic", "model_best.npz")
    if not os.path.exists(snap):
        return {"realistic_error": "no committed checkpoint at " + snap}

    data_dir = os.path.join(repo, "data", "DemoPanoptic")
    if not os.path.isdir(data_dir):
        # demo fixtures are seeded/deterministic; regenerate on a fresh box
        subprocess.run(
            [sys.executable, os.path.join(repo, "scripts/make_demo_data.py"),
             "--out", data_dir, "--views", "5", "--poses", "2000",
             "--skeleton", "panoptic15", "--center", "0", "-500",
             "--radius", "2800", "--image-size", "1920", "1080"],
            check=True,
        )

    cfg = load_config(os.path.join(repo, "configs/demo/panoptic_synthetic.yaml"))
    cfg.DATASET.DEVICE_RENDER = False  # this bench feeds materialized heatmaps
    cfg.SYNTHETIC.NUM_DATA = 64  # scene statistics only; keep db build fast
    model = build_model(cfg)
    ds = get_dataset(cfg.DATASET.TEST_DATASET)(cfg, is_train=False)

    n_frames = 24
    samples = [ds[i] for i in range(n_frames)]
    heatmaps = np.stack([s["input_heatmaps"] for s in samples])
    cams_r = np.stack([s["cameras"] for s in samples])
    true_people = float(np.mean([int(s["num_person"]) for s in samples]))

    V = cfg.DATASET.CAMERA_NUM
    iw, ih = cfg.DATASET.IMAGE_SIZE
    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    template = model.init(
        jax.random.PRNGKey(0), np.zeros((1, V, H, W, J), np.float32),
        cams_r[:1], train=False,
    )
    variables = load_best_npz(snap, template)

    backbone = build_backbone(cfg)
    bvars = backbone.init(
        jax.random.PRNGKey(1), np.zeros((1, ih, iw, 3), np.float32)
    )

    @jax.jit
    def fwd(hm, cam):
        out = model.apply(variables, hm, cam, train=False, mutable=False)
        return out.fused_poses, out.proposal_centers

    _, centers = jax.block_until_ready(fwd(heatmaps[:8], cams_r[:8]))
    detected = float((np.asarray(centers)[:, :, 3] >= 0).sum(1).mean())

    rng = np.random.RandomState(1)

    def slope(make_step, shapes, n1, n2):
        """per-step time as the slope between two scan lengths (same
        dispatch-cancelling methodology as the headline)."""

        def run_for(F):
            xs = tuple(
                jnp.asarray(np.resize(a, (F,) + a.shape[1:])) for a in shapes
            )

            @jax.jit
            def run(*xs):
                def body(c, x):
                    out = make_step(c, x)
                    ss = (jnp.sum(out[..., :1]) * 1e-30).astype(jnp.float32)
                    return ss, ss

                _, o = jax.lax.scan(body, jnp.float32(0.0), xs)
                return o

            np.asarray(run(*xs))  # compile + warm
            best = np.inf
            for _ in range(3):
                t0 = _time.perf_counter()
                np.asarray(run(*xs))  # real value fetch
                best = min(best, _time.perf_counter() - t0)
            return best

        return (run_for(n2) - run_for(n1)) / (n2 - n1)

    # fusion-only latency + throughput
    def fusion_step(c, x):
        hm, cam = x
        fused, _ = fwd(hm[None] + c * 1e-30, cam[None])
        return fused

    per_frame = slope(fusion_step, (heatmaps, cams_r), 3, 18)
    fusion_fps = 1.0 / per_frame

    def fusion_step_b(c, x):
        hm, cam = x
        fused, _ = fwd(hm + c * 1e-30, cam)
        return fused

    hm_b = np.resize(heatmaps, (TB,) + heatmaps.shape[1:])
    cam_b = np.resize(cams_r, (TB,) + cams_r.shape[1:])
    per_step_b = slope(
        fusion_step_b,
        (hm_b[None], cam_b[None]), 1, 4,
    )
    fusion_fps_b = TB / per_step_b

    # full-pipeline (backbone + trained fusion): the backbone's output is
    # folded in at 1e-30 weight so its cost is paid inside the same
    # sequential dependence while detections stay those of the trained
    # detector on the held-out heatmaps
    images = rng.randn(4, V, ih, iw, 3).astype(np.float32)

    def e2e_step(c, x):
        hm, cam, img = x
        bb = backbone.apply(bvars, img + c, train=False, mutable=False)
        fused, _ = fwd(hm[None] + bb[None] * 1e-30, cam[None])
        return fused

    per_frame_e2e = slope(
        e2e_step, (heatmaps, cams_r, np.resize(images, (n_frames,) + images.shape[1:])),
        2, 10,
    )
    e2e_fps = 1.0 / per_frame_e2e

    def e2e_step_b(c, x):
        hm, cam, img = x
        flat = img.reshape((TB * V, ih, iw, 3))
        bb = backbone.apply(bvars, flat + c, train=False, mutable=False)
        fused, _ = fwd(hm + bb.reshape((TB, V) + bb.shape[1:]) * 1e-30, cam)
        return fused

    img_b = np.resize(images, (TB,) + images.shape[1:])
    per_step_e2e_b = slope(
        e2e_step_b, (hm_b[None], cam_b[None], img_b[None]), 1, 4
    )
    e2e_fps_b = TB / per_step_e2e_b

    return {
        "realistic_e2e_fps": round(e2e_fps, 2),
        "realistic_e2e_fps_batched": round(e2e_fps_b, 2),
        "realistic_fusion_fps": round(fusion_fps, 2),
        "realistic_fusion_fps_batched": round(fusion_fps_b, 2),
        "realistic_batch": TB,
        "realistic_true_people": round(true_people, 2),
        "realistic_detected_people": round(detected, 2),
        "realistic_min_score": cfg.CAPTURE_SPEC.MIN_SCORE,
        "realistic_note": (
            "trained committed checkpoint (checkpoints/panoptic_synthetic)"
            " at default MIN_SCORE on held-out synthetic scenes; e2e"
            " includes ResNet-50 over five 512x960 views (timing-only"
            " random-init backbone: real-image training is blocked),"
            " fusion-only is the reference's precomputed-heatmap mode"
        ),
    }


if __name__ == "__main__":
    # pause any concurrently-running training for the duration of the
    # measurement (train/eval loops poll this lock each step)
    from faster_voxelpose_tpu.utils.bench_lock import hold_bench_lock

    with hold_bench_lock():
        main()
