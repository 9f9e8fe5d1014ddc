"""Evaluation CLI: python run/validate.py --cfg configs/shelf/jln64.yaml

Capability parity with the reference's run/validate.py: loads the config's
best-model checkpoint (or a torch checkpoint via --torch-weights, enabling
direct evaluation of the reference's released models), runs batched
inference over the test dataset and prints the dataset's metric table.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate Faster-VoxelPose (TPU)")
    p.add_argument("--cfg", required=True)
    p.add_argument(
        "--torch-weights",
        default=None,
        help="evaluate a reference PyTorch checkpoint (model_best.pth.tar)",
    )
    p.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler trace of the eval loop into DIR "
        "(viewable in TensorBoard/Perfetto)",
    )
    return p.parse_args()


def evaluate_model(
    cfg,
    output_dir,
    torch_weights=None,
    weights_mode="best",
    test_ds=None,
    logger=None,
):
    """Checkpoint -> metric round trip, importable (run_real_parity.py
    drives this for all three benchmark datasets).

    weights_mode: 'best' loads the orbax best-model under output_dir;
    'random' evaluates a fresh init (pipeline dry-runs on fabricated
    data).  torch_weights (a reference model_best.pth.tar) overrides
    both.  Returns (metric, msg, preds, test_ds).
    """
    import logging

    from faster_voxelpose_tpu.datasets import get_dataset
    from faster_voxelpose_tpu.engine.checkpoint import load_best_model
    from faster_voxelpose_tpu.engine.loader import DatasetFactory
    from faster_voxelpose_tpu.engine.validator import run_validation
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.models.resnet import build_backbone

    logger = logger or logging.getLogger(__name__)
    if test_ds is None:
        test_ds = get_dataset(cfg.DATASET.TEST_DATASET)(cfg, is_train=False)

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

    if torch_weights:
        from faster_voxelpose_tpu.utils.weights_torch import (
            convert_model,
            load_torch_state_dict,
        )

        variables = convert_model(load_torch_state_dict(torch_weights))
        logger.info("=> converted torch weights from %s", torch_weights)
    elif weights_mode == "random":
        variables = template
        logger.info("=> evaluating RANDOM init (pipeline dry run)")
    else:
        variables = load_best_model(output_dir, template)
        logger.info("=> loaded best model from %s", output_dir)

    backbone = backbone_vars = None
    image_loader = None
    if cfg.DATASET.TEST_HEATMAP_SRC == "image":
        from faster_voxelpose_tpu.datasets.images import load_view_images_u8
        from faster_voxelpose_tpu.utils.weights_torch import (
            convert_backbone,
            load_torch_state_dict,
        )

        backbone = build_backbone(cfg)
        sd = load_torch_state_dict(cfg.NETWORK.PRETRAINED_BACKBONE)
        backbone_vars = convert_backbone(sd, cfg.RESNET.NUM_LAYERS)

        # ship uint8 frames; the eval step normalizes on device
        def image_loader(idxs):
            return np.stack(
                [
                    load_view_images_u8(
                        test_ds.records[i].image_paths,
                        cfg.DATASET.IMAGE_SIZE,
                        test_ds.resize_transform,
                    )
                    for i in idxs
                ]
            )

    metric, msg, preds = run_validation(
        cfg, model, variables, test_ds,
        backbone=backbone, backbone_vars=backbone_vars,
        image_loader=image_loader,
        # spawn-pool render workers rebuild the dataset from the picklable
        # factory (reference eval uses 8 loader workers too)
        dataset_factory=DatasetFactory(cfg.DATASET.TEST_DATASET, cfg, False)
        if cfg.WORKERS > 0 else None,
    )
    return metric, msg, preds, test_ds


def main():
    args = parse_args()

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.utils.logging_utils import create_logger
    from faster_voxelpose_tpu.utils.profiling import trace

    cfg = load_config(args.cfg)
    logger, output_dir, _ = create_logger(cfg, args.cfg, "validate")
    logger.info("devices: %s", jax.devices())

    with trace(args.profile):
        metric, msg, preds, test_ds = evaluate_model(
            cfg, output_dir, torch_weights=args.torch_weights, logger=logger
        )
    if args.profile:
        logger.info("wrote profiler trace to %s", args.profile)
    print(msg)
    print(f"metric: {metric:.4f}")

    if cfg.TEST.VISUALIZATION:
        # every configured VIS_TYPE artifact kind, like the reference's
        # test_vis_all (lib/core/function.py:163-165, lib/utils/vis.py:48-57)
        from faster_voxelpose_tpu.utils.vis import test_vis_all

        vis_dir = os.path.join(output_dir, "validation_vis")
        n_vis = min(len(preds), 20)
        idxs = list(range(n_vis))
        heatmaps = images = rigs = None
        if "heatmaps" in cfg.TEST.VIS_TYPE and cfg.DATASET.TEST_HEATMAP_SRC != "image":
            heatmaps = np.stack([test_ds[i]["input_heatmaps"] for i in idxs])
        if "image_with_poses" in cfg.TEST.VIS_TYPE:
            import cv2

            def _load_views(rec):
                return [
                    cv2.imread(p, cv2.IMREAD_COLOR)
                    for p in (rec.image_paths or [])
                ]

            loaded = [_load_views(test_ds.records[i]) for i in idxs]
            if all(v and all(im is not None for im in v) for v in loaded):
                images = loaded
                rigs = np.stack([test_ds[i]["cameras"] for i in idxs])
        test_vis_all(
            cfg, None, preds[:n_vis], None, heatmaps,
            os.path.join(vis_dir, "val"),
            images=images, packed_rigs=rigs,
            resize_transform=None,  # original-frame images: no warp
        )
        logger.info("wrote visualizations to %s", vis_dir)


if __name__ == "__main__":
    main()
