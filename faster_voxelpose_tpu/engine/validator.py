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
import numpy as np

from ..config import Config
from ..datasets.base import collate

logger = logging.getLogger(__name__)


def make_eval_step(cfg: Config, model, backbone=None, donate: bool = True):
    """One jitted eval step: heatmaps/images + cameras -> fused poses."""

    @functools.partial(jax.jit, static_argnames=())
    def eval_step(variables, heatmaps, cameras):
        out = model.apply(variables, heatmaps, cameras, train=False, mutable=False)
        return out.fused_poses

    if backbone is None:
        return eval_step

    @jax.jit
    def eval_step_images(variables, backbone_vars, images, cameras):
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
):
    """Full-dataset eval; returns (metric, message, preds (N,K,J,5))."""
    from ..utils.profiling import StepTimer

    bs = batch_size or cfg.TEST.BATCH_SIZE
    n = len(dataset)
    eval_step = make_eval_step(cfg, model, backbone)

    all_preds = []
    timer = StepTimer()
    t0 = time.time()
    for start in range(0, n, bs):
        idxs = list(range(start, min(start + bs, n)))
        pad = bs - len(idxs)
        samples = [dataset[i] for i in idxs]
        batch = collate(samples + [samples[-1]] * pad)

        with timer.step() as _:
            if backbone is None:
                preds = eval_step(
                    variables, batch["input_heatmaps"], batch["cameras"]
                )
            else:
                images = image_loader(idxs + [idxs[-1]] * pad)
                preds = eval_step(
                    variables, backbone_vars, images, batch["cameras"]
                )
            preds = np.asarray(preds)
        if pad:
            preds = preds[: len(idxs)]
        all_preds.append(preds)

    preds = np.concatenate(all_preds, axis=0)
    dt = time.time() - t0
    logger.info(
        "validated %d frames in %.1fs (%.1f frames/s); device %s",
        n, dt, n / max(dt, 1e-9), timer.summary(),
    )
    metric, msg = dataset.evaluate(preds)
    logger.info("\n%s", msg)
    return metric, msg, preds
