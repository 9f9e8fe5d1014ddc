"""Measure the fusion-stage speed of a WIDTH_MULT variant vs the
reference-width trunk (VERDICT round-4 task 6: the weight-deviating
speed experiment).

Usage:
    python scripts/bench_width.py \
        --cfg configs/demo/panoptic_synthetic.yaml \
        --cfg-narrow configs/demo/panoptic_synthetic_w05.yaml

Times the fused heatmaps->poses forward (the part WIDTH_MULT changes;
the ResNet-50 backbone is width-independent) for both configs with the
same slope methodology as bench.py, at the trained checkpoints when the
repo snapshots exist (timing is shape-dependent only, so random init is
used when a snapshot is absent — stated in the output).  The quality
side of the trade comes from the configs' training runs (DESIGN.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def time_fusion(cfg_path: str) -> dict:
    import jax
    import jax.numpy as jnp

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.engine.checkpoint import load_best_npz, repo_snapshot_dir
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model

    cfg = load_config(cfg_path)
    model = build_model(cfg)

    # real demo-calibration rigs + held-out heatmaps (timing is
    # shape-dependent, but realistic sparsity keeps the comparison honest)
    from faster_voxelpose_tpu.datasets import get_dataset

    cfg.SYNTHETIC.NUM_DATA = 8
    cfg.DATASET.DEVICE_RENDER = False
    ds = get_dataset(cfg.DATASET.TEST_DATASET)(cfg, is_train=False)
    cams = np.stack([ds[i]["cameras"] for i in range(8)])
    hm = np.stack([ds[i]["input_heatmaps"] for i in range(8)])

    template = model.init(
        jax.random.PRNGKey(0), hm[:1], cams[:1], train=False
    )
    profile = os.path.basename(
        os.path.splitext(cfg_path)[0]
    )
    snap = os.path.join(
        repo_snapshot_dir(os.path.join("output", profile)), "model_best.npz"
    )
    trained = os.path.exists(snap)
    variables = load_best_npz(snap, template) if trained else template

    @jax.jit
    def fwd(h, c):
        out = model.apply(variables, h, c, train=False, mutable=False)
        return out.fused_poses

    def run_for(F):
        hs = jnp.asarray(np.resize(hm, (F, 1) + hm.shape[1:]))
        cs = jnp.asarray(np.resize(cams, (F, 1) + cams.shape[1:]))

        @jax.jit
        def run(hs, cs):
            def body(carry, x):
                h, c = x
                out = fwd(h + carry * 1e-30, c)
                s = (jnp.sum(out) * 1e-30).astype(jnp.float32)
                return s, s

            _, o = jax.lax.scan(body, jnp.float32(0.0), (hs, cs))
            return o

        np.asarray(run(hs, cs))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(hs, cs))
            best = min(best, time.perf_counter() - t0)
        return best

    per_frame = (run_for(18) - run_for(3)) / 15.0
    n_params = sum(
        int(np.prod(np.shape(l))) for l in jax.tree_util.tree_leaves(template)
    )
    return {
        "cfg": cfg_path,
        "width_mult": cfg.NETWORK.WIDTH_MULT,
        "fusion_ms_per_frame": round(per_frame * 1e3, 2),
        "fusion_fps": round(1.0 / per_frame, 2),
        "params": n_params,
        "weights": "trained snapshot" if trained else "random init (timing only)",
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="configs/demo/panoptic_synthetic.yaml")
    p.add_argument("--cfg-narrow", default="configs/demo/panoptic_synthetic_w05.yaml")
    args = p.parse_args()

    base = time_fusion(args.cfg)
    narrow = time_fusion(args.cfg_narrow)
    speedup = base["fusion_ms_per_frame"] / narrow["fusion_ms_per_frame"]
    print(json.dumps({"base": base, "narrow": narrow,
                      "narrow_speedup": round(speedup, 3)}))


if __name__ == "__main__":
    main()
