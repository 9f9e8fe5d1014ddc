"""Training CLI: python run/train.py --cfg configs/shelf/jln64.yaml

Capability parity with the reference's run/train.py: config-driven
dataset/model construction, frozen pretrained backbone, dual optimizers,
per-epoch validation with best-model tracking, resumable checkpoints.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache: long runs are relaunched (resume, eval-every
# sweeps) and the remote-tunnel compiles are minutes-cold otherwise
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train Faster-VoxelPose (TPU)")
    p.add_argument("--cfg", required=True, help="experiment yaml")
    p.add_argument("--epochs", type=int, default=None, help="override END_EPOCH")
    p.add_argument("--num-data", type=int, default=None, help="override SYNTHETIC.NUM_DATA")
    p.add_argument("--resume", action="store_true", help="resume from checkpoint")
    p.add_argument(
        "--eval-every", type=int, default=1,
        help="validate every N epochs (the final epoch always validates); "
        "long reference-budget runs use N>1 to keep the chip on training",
    )
    return p.parse_args()


def main():
    args = parse_args()

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.datasets import get_dataset
    from faster_voxelpose_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
    from faster_voxelpose_tpu.engine.loader import DataLoader, prefetch_to_device
    from faster_voxelpose_tpu.engine.trainer import (
        AverageMeter,
        create_train_state,
        make_train_step,
    )
    from faster_voxelpose_tpu.engine.validator import run_validation
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.models.resnet import build_backbone
    from faster_voxelpose_tpu.utils.bench_lock import wait_if_bench_locked
    from faster_voxelpose_tpu.utils.logging_utils import ScalarWriter, create_logger

    cfg = load_config(args.cfg)
    if args.epochs is not None:
        cfg.TRAIN.END_EPOCH = args.epochs
    if args.num_data is not None:
        cfg.SYNTHETIC.NUM_DATA = args.num_data
    if args.resume:
        cfg.TRAIN.RESUME = True

    logger, output_dir, log_dir = create_logger(cfg, args.cfg, "train")
    writer = ScalarWriter(log_dir)
    logger.info("devices: %s", jax.devices())

    train_ds = get_dataset(cfg.DATASET.TRAIN_DATASET)(cfg, is_train=True)
    test_ds = get_dataset(cfg.DATASET.TEST_DATASET)(cfg, is_train=False)

    model = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.TRAIN.SEED)

    # init with a dummy batch shape
    B, V = 1, cfg.DATASET.CAMERA_NUM
    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    dummy_hm = np.zeros((B, V, H, W, J), np.float32)
    dummy_cam = np.zeros((B, V, 21), np.float32)
    variables = model.init(rng, dummy_hm, dummy_cam, train=False)

    backbone = backbone_vars = None
    if cfg.DATASET.TRAIN_HEATMAP_SRC == "image" or cfg.DATASET.TEST_HEATMAP_SRC == "image":
        backbone = build_backbone(cfg)
        iw, ih = cfg.DATASET.IMAGE_SIZE
        backbone_vars = backbone.init(rng, np.zeros((1, ih, iw, 3), np.float32))
        if cfg.NETWORK.PRETRAINED_BACKBONE:
            from faster_voxelpose_tpu.utils.weights_torch import (
                convert_backbone,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(cfg.NETWORK.PRETRAINED_BACKBONE)
            backbone_vars = convert_backbone(sd, cfg.RESNET.NUM_LAYERS)
            logger.info("=> loaded pretrained backbone %s", cfg.NETWORK.PRETRAINED_BACKBONE)

    state = create_train_state(cfg, variables)
    start_epoch, best_metric = 0, -np.inf
    if cfg.TRAIN.RESUME:
        state, start_epoch, best_metric = load_checkpoint(output_dir, state)

    train_step = jax.jit(make_train_step(cfg, model, backbone), donate_argnums=(0,))

    # multi-process sample rendering (reference run/train.py:68-73 uses
    # cfg.WORKERS torch DataLoader workers); spawn workers rebuild the
    # dataset from the picklable factory (no fork after JAX init).
    from faster_voxelpose_tpu.engine.loader import DatasetFactory

    loader = DataLoader(
        train_ds,
        cfg.TRAIN.BATCH_SIZE,
        shuffle=cfg.TRAIN.SHUFFLE,
        drop_last=True,
        num_workers=cfg.WORKERS,
        seed=cfg.TRAIN.SEED,
        dataset_factory=DatasetFactory(cfg.DATASET.TRAIN_DATASET, cfg, True)
        if cfg.WORKERS > 0 else None,
    )

    meters = {k: AverageMeter() for k in ("total", "2d", "1d", "bbox", "joint", "time")}
    global_step = 0

    # training-time visualization step (reference train_vis_all,
    # function.py:112-114): one jit shared by every rendered batch
    vis_step = vis_backbone_step = None
    if cfg.TRAIN.VISUALIZATION:
        @jax.jit
        def vis_step(eval_vars, hm, cams):
            out = model.apply(eval_vars, hm, cams, train=False, mutable=False)
            return out.fused_poses, out.proposal_centers

        if backbone is not None:
            @jax.jit
            def vis_backbone_step(bvars, images):
                B, V = images.shape[:2]
                flat = images.reshape((B * V,) + images.shape[2:])
                hm = backbone.apply(bvars, flat, train=False, mutable=False)
                return hm.reshape((B, V) + hm.shape[1:])

        from faster_voxelpose_tpu.ops.heatmap_render import render_heatmaps_device

        _vis_w, _vis_h = cfg.DATASET.HEATMAP_SIZE
        # one jit shared by every rendered batch (not rebuilt per batch,
        # which would re-trace the renderer each visualization)
        vis_render_step = jax.jit(
            lambda p: render_heatmaps_device(p, _vis_h, _vis_w)
        )
    for epoch in range(start_epoch, cfg.TRAIN.END_EPOCH):
        logger.info("epoch %d", epoch)
        end = time.time()
        for i, batch in enumerate(prefetch_to_device(iter(loader))):
            # yield the chip to a concurrently-running bench.py (driver
            # captures the round benchmark on this same chip)
            wait_if_bench_locked()
            batch.pop("_valid", None)
            batch.pop("offset", None)
            state, losses = train_step(state, batch, backbone_vars)
            if i % cfg.PRINT_FREQ == 0:
                # block on this step's losses so the reported batch time is
                # the true step latency, not the async-dispatch queue time
                losses = {k: float(v) for k, v in losses.items()}
                batch_time = (time.time() - end) / (1 if i == 0 else cfg.PRINT_FREQ)
                meters["time"].update(batch_time)
                for k, mk in (("total", "total"), ("2d_heatmaps", "2d"),
                              ("1d_heatmaps", "1d"), ("bbox", "bbox"), ("joint", "joint")):
                    meters[mk].update(losses[k])
                    writer.add_scalar(f"train_loss_{mk}", losses[k], global_step)
                speed = cfg.TRAIN.BATCH_SIZE / max(batch_time, 1e-9)
                logger.info(
                    "Epoch [%d][%d/%d] Speed %.1f samples/s (%.3fs/batch) "
                    "Loss %.6f (2d %.6f 1d %.6f bbox %.6f joint %.6f)",
                    epoch, i, len(loader), speed, batch_time, losses["total"],
                    losses["2d_heatmaps"], losses["1d_heatmaps"],
                    losses["bbox"], losses["joint"],
                )
                if cfg.TRAIN.VISUALIZATION and (
                    "input_heatmaps" in batch or "hm_params" in batch
                    or "images" in batch
                ):
                    # every configured VIS_TYPE artifact for this batch
                    # (reference train_vis_all, vis.py:34-46)
                    from faster_voxelpose_tpu.utils.vis import train_vis_all

                    eval_vars = {
                        "params": state.params, "batch_stats": state.batch_stats,
                    }
                    if "input_heatmaps" in batch:
                        hm = batch["input_heatmaps"]
                    elif "hm_params" in batch:  # device-render mode
                        hm = vis_render_step(batch["hm_params"])
                    else:  # image source: heatmaps from the backbone
                        hm = vis_backbone_step(backbone_vars, batch["images"])
                    preds, pcs = vis_step(eval_vars, hm, batch["cameras"])
                    images = None
                    if "images" in batch:
                        from faster_voxelpose_tpu.datasets.images import (
                            denormalize_images,
                        )

                        images = denormalize_images(np.asarray(batch["images"]))
                    train_vis_all(
                        cfg, np.asarray(preds), np.asarray(pcs),
                        np.asarray(hm),
                        os.path.join(output_dir, "train_vis", f"{epoch}_{i:06d}"),
                        images=images,
                        packed_rigs=np.asarray(batch["cameras"]),
                        resize_transform=train_ds.resize_transform
                        if images is not None else None,
                    )
                end = time.time()
            global_step += 1

        eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
        # eval_every <= 0 means "final epoch only" (and guards the % 0)
        if (args.eval_every > 0 and (epoch + 1) % args.eval_every == 0) \
                or epoch + 1 == cfg.TRAIN.END_EPOCH:
            metric, msg, _ = run_validation(
                cfg, model, eval_vars, test_ds,
                dataset_factory=DatasetFactory(cfg.DATASET.TEST_DATASET, cfg, False)
                if cfg.WORKERS > 0 else None,
            )
            writer.add_scalar("eval_metric", metric, epoch)
            is_best = metric > best_metric
            best_metric = max(metric, best_metric)
            if is_best:
                # durable in-repo snapshot (the reference ships model_best
                # .pth.tar in its model zoo, README.md:123-131): npz weights
                # + an eval record so validate round-trips on a fresh box
                from faster_voxelpose_tpu.engine.checkpoint import (
                    write_repo_snapshot,
                )

                write_repo_snapshot(
                    output_dir, eval_vars,
                    {"config": os.path.abspath(args.cfg), "epoch": epoch + 1,
                     "metric": float(metric), "message": msg,
                     "seed": cfg.TRAIN.SEED},
                )
        else:
            is_best = False
        save_checkpoint(output_dir, state, epoch + 1, best_metric, is_best, eval_vars)

    loader.close()
    logger.info("done; best metric %.4f", best_metric)
    writer.close()


if __name__ == "__main__":
    main()
