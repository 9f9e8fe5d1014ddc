"""Evaluation engine: jitted batched inference + dataset metric computation.

Capability parity with lib/core/function.py:117-174 and run/validate.py's
inference loop: iterate the eval set with a fixed batch shape (final
partial batch padded, padding rows discarded on host), collect fused
poses, delegate to the dataset's metric protocol.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..utils.bench_lock import wait_if_bench_locked

logger = logging.getLogger(__name__)


def make_eval_step(cfg: Config, model, backbone=None):
    """One jitted eval step: heatmaps/images + cameras -> fused poses."""

    hm_w, hm_h = cfg.DATASET.HEATMAP_SIZE

    @functools.partial(jax.jit, static_argnames=("is_params",))
    def eval_step(variables, heatmaps, cameras, is_params=False):
        if is_params:
            # 'hm_params' device-render parameterization (B, V, K, J, 12)
            # instead of rendered maps (see ops/heatmap_render.py); the
            # caller sets is_params from which batch key it read, so the
            # dispatch can never misroute on a shape collision
            from ..ops.heatmap_render import render_heatmaps_device

            heatmaps = render_heatmaps_device(heatmaps, hm_h, hm_w)
        out = model.apply(variables, heatmaps, cameras, train=False, mutable=False)
        return out.fused_poses

    if backbone is None:
        return eval_step

    @jax.jit
    def eval_step_images(variables, backbone_vars, images, cameras):
        if images.dtype == jnp.uint8:
            # uint8 transfer mode: normalize + RGB swap on device, fused
            # by XLA into the backbone stem (4x smaller uploads)
            from ..datasets.images import normalize_images_device

            images = normalize_images_device(images, cfg.DATASET.COLOR_RGB)
        B, V = images.shape[:2]
        flat = images.reshape((B * V,) + images.shape[2:])
        hm = backbone.apply(backbone_vars, flat, train=False, mutable=False)
        heatmaps = hm.reshape((B, V) + hm.shape[1:])
        out = model.apply(variables, heatmaps, cameras, train=False, mutable=False)
        return out.fused_poses

    return eval_step_images


def run_validation(
    cfg: Config,
    model,
    variables,
    dataset,
    backbone=None,
    backbone_vars=None,
    batch_size: Optional[int] = None,
    image_loader=None,
    dataset_factory=None,
    num_workers: Optional[int] = None,
):
    """Full-dataset eval; returns (metric, message, preds (N,K,J,5)).

    Sample rendering runs through the same worker-pool DataLoader +
    device prefetch the train loop uses (the reference validates through
    an 8-worker torch DataLoader too, run/validate.py:47-59): pass
    dataset_factory to enable cfg.WORKERS render processes; without it
    rendering stays on the main thread but transfers still overlap
    compute via the prefetch thread."""
    from ..utils.profiling import StepTimer
    from .loader import DataLoader, prefetch_to_device

    bs = batch_size or cfg.TEST.BATCH_SIZE
    n = len(dataset)
    eval_step = make_eval_step(cfg, model, backbone)

    workers = (cfg.WORKERS if num_workers is None else num_workers) if (
        dataset_factory is not None
    ) else 0
    loader = DataLoader(
        dataset, bs, shuffle=False, drop_last=False,
        num_workers=workers, dataset_factory=dataset_factory,
    )

    all_preds = []
    timer = StepTimer()
    t0 = time.time()
    try:
        for bi, batch in enumerate(prefetch_to_device(iter(loader))):
            # yield the chip to a concurrently-running bench.py
            wait_if_bench_locked()
            # eval order is sequential and unshuffled: batch bi covers
            # records [bi*bs, min((bi+1)*bs, n)) (tail padded by loader)
            idxs = list(range(bi * bs, min((bi + 1) * bs, n)))
            pad = bs - len(idxs)
            with timer.step() as st:
                if backbone is None:
                    hm = batch.get("input_heatmaps")
                    is_params = hm is None
                    if is_params:
                        hm = batch["hm_params"]  # device-render mode
                    preds_dev = eval_step(
                        variables, hm, batch["cameras"], is_params=is_params
                    )
                else:
                    images = image_loader(idxs + [idxs[-1]] * pad)
                    preds_dev = eval_step(
                        variables, backbone_vars, images, batch["cameras"]
                    )
                st.set(preds_dev)
            # fetch outside the timed section so host_s is dispatch-only
            preds = np.asarray(preds_dev)
            if pad:
                preds = preds[: len(idxs)]
            all_preds.append(preds)
    finally:
        loader.close()

    preds = np.concatenate(all_preds, axis=0)
    dt = time.time() - t0
    logger.info(
        "validated %d frames in %.1fs (%.1f frames/s); %s",
        n, dt, n / max(dt, 1e-9), timer.summary(),
    )
    metric, msg = dataset.evaluate(preds)
    logger.info("\n%s", msg)
    return metric, msg, preds
