"""One-shot real-data parity harness (VERDICT round-2 task 5).

Given a populated data/ directory and the reference's released
checkpoints, this runs the full chain for each benchmark dataset —
(optional) image preprocessing -> torch-checkpoint conversion ->
batched TPU validation -> metric table — and writes PARITY.md comparing
the measured numbers against the reference model zoo
(/root/reference/README.md:123-131).

Usage:
    scripts/run_real_parity.sh                 # all three datasets
    python scripts/run_real_parity.py \
        --data-dir data --weights-dir weights \
        [--datasets panoptic,shelf,campus] [--max-frames N] \
        [--weights-mode torch|best|random] [--out PARITY.md]

Expected layout (see scripts/download_*.sh):
    data/Panoptic, data/Shelf, data/Campus
    weights/panoptic_model_best.pth.tar, weights/shelf_model_best.pth.tar,
    weights/campus_model_best.pth.tar, backbone/pose_resnet50_panoptic.pth.tar

The driver is importable: tests/test_parity_harness.py runs the same
run_parity() end to end on fabricated mini-datasets (weights_mode=
'random'), so the harness is proven before it ever meets real data.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# reference model zoo (/root/reference/README.md:123-131)
REFERENCE_ZOO = {
    "panoptic": {"metric_name": "AP25", "MPJPE": 18.41, "AP25": 86.66,
                 "AP50": 98.08, "AP100": 99.26, "AP150": 99.53},
    "shelf": {"metric_name": "PCP3D", "PCP3D": 97.6},
    "campus": {"metric_name": "PCP3D", "PCP3D": 96.9},
}

CONFIGS = {
    "panoptic": "configs/panoptic/jln64.yaml",
    "shelf": "configs/shelf/jln64.yaml",
    "campus": "configs/campus/jln64.yaml",
}

WEIGHT_FILES = {
    "panoptic": "panoptic_model_best.pth.tar",
    "shelf": "shelf_model_best.pth.tar",
    "campus": "campus_model_best.pth.tar",
}


class _Truncated:
    """Evaluate only the first n frames (smoke runs / fixtures); proxies
    everything else to the underlying dataset."""

    def __init__(self, ds, n):
        self._ds = ds
        self._n = min(n, len(ds))

    def __len__(self):
        return self._n

    def __getitem__(self, i):
        return self._ds[i]

    def evaluate(self, preds):
        return self._ds.evaluate(preds)

    def __getattr__(self, name):
        return getattr(self._ds, name)


def run_parity(
    data_dir: str,
    weights_dir: str = "",
    datasets=("panoptic", "shelf", "campus"),
    max_frames: int = 0,
    weights_mode: str = "torch",
    preprocess: bool = False,
    out_path: str = "PARITY.md",
    cfg_hook=None,
    dataset_hook=None,
):
    """Run checkpoint->metric for every requested dataset; write out_path.

    weights_mode: 'torch' converts {weights_dir}/{name}_model_best.pth.tar;
    'best' loads this repo's own trained orbax checkpoint; 'random'
    dry-runs the pipeline with a fresh init (fixtures).  cfg_hook(name,
    cfg) may adjust the loaded config (fixtures use it to shrink camera
    counts); dataset_hook(name, cfg) may construct the dataset itself.
    Returns the list of per-dataset result dicts.
    """
    from faster_voxelpose_tpu.config import load_config

    sys.path.insert(0, os.path.join(REPO, "run"))
    from validate import evaluate_model  # noqa: E402

    results = []
    for name in datasets:
        cfg = load_config(os.path.join(REPO, CONFIGS[name]))
        cfg.DATASET.DATADIR = os.path.join(data_dir, cfg.DATASET.DATADIR.split("/")[-1])
        if cfg_hook is not None:
            cfg_hook(name, cfg)
        if not os.path.isdir(cfg.DATASET.DATADIR) and dataset_hook is None:
            print(f"[{name}] SKIP: no data at {cfg.DATASET.DATADIR}")
            results.append({"name": name, "status": "no-data"})
            continue

        torch_weights = None
        if weights_mode == "torch":
            torch_weights = os.path.join(weights_dir, WEIGHT_FILES[name])
            if not os.path.isfile(torch_weights):
                print(f"[{name}] SKIP: no checkpoint at {torch_weights}")
                results.append({"name": name, "status": "no-weights"})
                continue

        if cfg.DATASET.TEST_HEATMAP_SRC == "image":
            # image path (Panoptic): resolve the released backbone
            # checkpoint so one command covers preprocess -> backbone
            # conversion -> validation.  Search order: the config's own
            # path, then weights_dir/<basename>.
            bb = cfg.NETWORK.PRETRAINED_BACKBONE
            if not os.path.isfile(bb):
                cand = os.path.join(weights_dir, os.path.basename(bb))
                if os.path.isfile(cand):
                    cfg.NETWORK.PRETRAINED_BACKBONE = cand
                else:
                    print(f"[{name}] SKIP: image heatmap source but no "
                          f"backbone checkpoint at {bb} or {cand}")
                    results.append({"name": name, "status": "no-backbone"})
                    continue

        if preprocess and cfg.DATASET.TEST_HEATMAP_SRC == "image":
            _preprocess_images(cfg)

        test_ds = None
        if dataset_hook is not None:
            test_ds = dataset_hook(name, cfg)
        else:
            from faster_voxelpose_tpu.datasets import get_dataset

            test_ds = get_dataset(cfg.DATASET.TEST_DATASET)(cfg, is_train=False)
        if max_frames:
            test_ds = _Truncated(test_ds, max_frames)

        t0 = time.time()
        metric, msg, preds, _ = evaluate_model(
            cfg,
            output_dir=os.path.join(cfg.OUTPUT_DIR, name),
            torch_weights=torch_weights,
            weights_mode=weights_mode if weights_mode != "torch" else "best",
            test_ds=test_ds,
        )
        dt = time.time() - t0
        print(f"[{name}] metric {metric:.4f} over {len(test_ds)} frames "
              f"in {dt:.1f}s\n{msg}")
        results.append({
            "name": name, "status": "ok", "metric": float(metric),
            "frames": len(test_ds), "seconds": dt, "table": msg,
            "weights": torch_weights or weights_mode,
        })

    write_parity_md(results, out_path, weights_mode)
    return results


def _preprocess_images(cfg):
    """In-place idempotent resize of dataset images (run/preprocess.py)."""
    sys.path.insert(0, os.path.join(REPO, "run"))
    import preprocess as pp  # noqa: E402

    from faster_voxelpose_tpu.datasets import get_dataset
    from faster_voxelpose_tpu.geometry.transforms import get_resize_transform

    ds = get_dataset(cfg.DATASET.TEST_DATASET)(cfg, is_train=False)
    transform = get_resize_transform(cfg.DATASET.ORI_IMAGE_SIZE, cfg.DATASET.IMAGE_SIZE)
    pp._init(transform, cfg.DATASET.IMAGE_SIZE)
    n = 0
    for rec in ds.records:
        for p in rec.image_paths or []:
            n += bool(pp._process(p))
    print(f"preprocessed {n} images")


def write_parity_md(results, out_path, weights_mode):
    lines = [
        "# Real-data parity vs the reference model zoo",
        "",
        f"Generated by scripts/run_real_parity.py (weights: {weights_mode}).",
        "Reference numbers: /root/reference/README.md:123-131.",
        "",
        "| dataset | status | frames | our metric | zoo headline | eval time |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        zoo = REFERENCE_ZOO[r["name"]]
        head = f"{zoo['metric_name']} {zoo[zoo['metric_name']]}"
        if r["status"] != "ok":
            lines.append(f"| {r['name']} | {r['status']} | - | - | {head} | - |")
        else:
            lines.append(
                f"| {r['name']} | ok | {r['frames']} | {r['metric']:.4f} | "
                f"{head} | {r['seconds']:.1f}s |"
            )
    lines.append("")
    for r in results:
        if r["status"] == "ok":
            lines += [f"## {r['name']}", "", "```", r["table"].strip(), "```", ""]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--data-dir", default="data")
    p.add_argument("--weights-dir", default="weights")
    p.add_argument("--datasets", default="panoptic,shelf,campus")
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--weights-mode", default="torch",
                   choices=["torch", "best", "random"])
    p.add_argument("--preprocess", action="store_true")
    p.add_argument("--out", default="PARITY.md")
    a = p.parse_args()
    run_parity(
        a.data_dir, a.weights_dir, a.datasets.split(","), a.max_frames,
        a.weights_mode, a.preprocess, a.out,
    )


if __name__ == "__main__":
    main()
