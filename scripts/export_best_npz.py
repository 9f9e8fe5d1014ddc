"""Export a trained orbax best-model into the durable in-repo snapshot.

Usage: python scripts/export_best_npz.py --cfg configs/demo/panoptic_synthetic.yaml

Loads the orbax best-model under the config's output dir, writes
checkpoints/<profile>/model_best.npz, then RELOADS the npz and runs the
full validation loop with it — so the eval_record.json metric is produced
by the committed artifact itself, not the orbax original.  This is the
repo equivalent of publishing a model-zoo entry (the reference ships
model_best.pth.tar per experiment, /root/reference/README.md:123-131).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    args = p.parse_args()

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.datasets import get_dataset
    from faster_voxelpose_tpu.engine.checkpoint import (
        load_best_model,
        load_best_npz,
        repo_snapshot_dir,
        save_best_npz,
    )
    from faster_voxelpose_tpu.engine.validator import run_validation
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.utils.logging_utils import create_logger

    cfg = load_config(args.cfg)
    logger, output_dir, _ = create_logger(cfg, args.cfg, "export")

    model = build_model(cfg)
    B, V = 1, cfg.DATASET.CAMERA_NUM
    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    template = model.init(
        jax.random.PRNGKey(0),
        np.zeros((B, V, H, W, J), np.float32),
        np.zeros((B, V, 21), np.float32),
        train=False,
    )
    variables = load_best_model(output_dir, template)

    snap_dir = repo_snapshot_dir(output_dir)
    os.makedirs(snap_dir, exist_ok=True)
    npz_path = os.path.join(snap_dir, "model_best.npz")
    save_best_npz(npz_path, variables)

    # round-trip: evaluate the committed artifact, not the orbax source
    reloaded = load_best_npz(npz_path, template)
    test_ds = get_dataset(cfg.DATASET.TEST_DATASET)(cfg, is_train=False)
    metric, msg, _ = run_validation(cfg, model, reloaded, test_ds)
    logger.info("npz round-trip eval:\n%s", msg)

    # best epoch: the epoch of the LAST "saved best model" event across
    # the run's train logs (int, like the in-training snapshot records —
    # tests/test_model_zoo.py enforces the schema)
    epoch = None
    try:
        import re

        for lf in sorted(
            f for f in os.listdir(output_dir) if f.endswith("_train.log")
        ):
            cur = None
            with open(os.path.join(output_dir, lf), errors="ignore") as f:
                for line in f:
                    m = re.search(r"\bepoch (\d+)$", line.strip())
                    if m:
                        cur = int(m.group(1))
                    if "saved best model" in line and cur is not None:
                        epoch = cur
    except OSError:
        pass
    record = {
        "config": os.path.relpath(os.path.abspath(args.cfg),
                                  os.path.dirname(snap_dir) + "/.."),
        "metric": float(metric),
        "message": msg,
        "seed": cfg.TRAIN.SEED,
        "epoch": epoch,
        "eval_set": f"{cfg.DATASET.TEST_DATASET}/"
                    f"{len(test_ds)} samples (held-out synthetic)",
    }
    with open(os.path.join(snap_dir, "eval_record.json"), "w") as f:
        json.dump(record, f, indent=2)
    print(f"snapshot: {snap_dir}")
    print(f"metric (npz round-trip): {metric:.4f}")


if __name__ == "__main__":
    main()
