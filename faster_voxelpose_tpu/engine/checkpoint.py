"""Checkpoint / resume via orbax.

Capability parity with lib/utils/utils.py:74-98: full training state
(epoch, model params + BN stats, both optimizer states, best metric) plus
a separate best-model snapshot with the backbone stripped.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)

CHECKPOINT_NAME = "checkpoint"
BEST_NAME = "model_best"


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    output_dir: str,
    state,
    epoch: int,
    best_metric: float,
    is_best: bool,
    model_variables: Optional[Dict[str, Any]] = None,
) -> None:
    """Write the resumable training checkpoint and, when is_best, the
    standalone best-model variables (backbone excluded, matching the
    reference's stripped model_best.pth.tar, utils.py:93-98)."""
    ckpt = {
        "epoch": np.asarray(epoch),
        "best_metric": np.asarray(best_metric),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state_pose": state.opt_state_pose,
        "opt_state_joint": state.opt_state_joint,
        "step": state.step,
    }
    path = os.path.join(os.path.abspath(output_dir), CHECKPOINT_NAME)
    _checkpointer().save(path, ckpt, force=True)
    logger.info("=> saved checkpoint at epoch %d to %s", epoch, path)

    if is_best and model_variables is not None:
        best_path = os.path.join(os.path.abspath(output_dir), BEST_NAME)
        _checkpointer().save(best_path, model_variables, force=True)
        logger.info("=> saved best model to %s", best_path)


def load_checkpoint(output_dir: str, state) -> Tuple[Any, int, float]:
    """Restore a training checkpoint into the given state template.
    Returns (state, start_epoch, best_metric)."""
    path = os.path.join(os.path.abspath(output_dir), CHECKPOINT_NAME)
    if not os.path.exists(path):
        logger.info("=> no checkpoint at %s, starting fresh", path)
        return state, 0, -np.inf

    template = {
        "epoch": np.asarray(0),
        "best_metric": np.asarray(0.0),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state_pose": state.opt_state_pose,
        "opt_state_joint": state.opt_state_joint,
        "step": state.step,
    }
    restored = _checkpointer().restore(path, item=template)
    new_state = state._replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state_pose=restored["opt_state_pose"],
        opt_state_joint=restored["opt_state_joint"],
        step=restored["step"],
    )
    epoch = int(restored["epoch"])
    best = float(restored["best_metric"])
    logger.info("=> resumed from %s at epoch %d", path, epoch)
    return new_state, epoch, best


def load_best_model(output_dir: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Load the best-model variables snapshot (run/validate.py:78-83)."""
    path = os.path.join(os.path.abspath(output_dir), BEST_NAME)
    return _checkpointer().restore(path, item=template)
