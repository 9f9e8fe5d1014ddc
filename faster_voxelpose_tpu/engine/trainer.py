"""Training engine: dual-optimizer step, loss partitioning, epoch loop.

Capability parity with lib/core/function.py:15-114 + run/train.py:39-54,
re-designed as one jit-compiled train step:

* The reference runs two backward passes per batch (JLN loss every step;
  HDN losses accumulated over 4 steps, function.py:65-76).  Because the
  parameter sets are disjoint (JLN sees only detached proposals) a single
  gradient of (joint + 2d + 1d + bbox) yields exactly the same per-
  partition gradients, so one backward pass feeds both optimizers.
* optimizer['pose'] (HDN) = Adam wrapped in optax.MultiSteps(k=4): clean
  accumulate-k-then-step semantics.  (Deliberate deviation: the reference's
  scheme drops every 4th batch's HDN loss due to an accumulate-after-check
  ordering, function.py:70-76 — we accumulate all 4.)
* optimizer['joint'] (JLN) = Adam, skipped via lax.cond when the joint
  loss is exactly zero (no valid proposals), matching the reference's
  `if loss_joint > 0` gate (function.py:65) including its effect on Adam
  momentum.
* The frozen backbone stays outside both optimizers (run/train.py:41-43);
  its BatchNorm statistics are frozen by default (cfg.TRAIN.
  UPDATE_BACKBONE_BN_STATS replicates the reference's drifting-stats
  behaviour, run/train.py:115, when wanted).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state_pose: Any
    opt_state_joint: Any
    step: jnp.ndarray


def partition_params(params) -> Tuple[Any, Any]:
    """Split the model param tree into (pose=HDN, joint=JLN) partitions.

    The partition must cover the whole tree: a top-level subtree that is
    neither 'hdn' nor 'jln' would silently receive zero updates, so it is
    an error (e.g. if a trainable backbone ever joins `params`, extend the
    partitioning deliberately rather than dropping its gradients)."""
    pose = {k: v for k, v in params.items() if k == "hdn"}
    joint = {k: v for k, v in params.items() if k == "jln"}
    uncovered = set(params) - set(pose) - set(joint)
    if uncovered:
        raise ValueError(
            f"param subtrees {sorted(uncovered)} are covered by neither "
            "optimizer partition (pose='hdn', joint='jln'); they would get "
            "zero updates"
        )
    return pose, joint


def make_optimizers(cfg: Config):
    lr = cfg.TRAIN.LR
    accum = cfg.TRAIN.ACCUMULATION_STEPS
    tx_pose = optax.MultiSteps(optax.adam(lr), every_k_schedule=accum)
    tx_joint = optax.adam(lr)
    return tx_pose, tx_joint


def create_train_state(cfg: Config, variables: Dict[str, Any]) -> TrainState:
    tx_pose, tx_joint = make_optimizers(cfg)
    params = variables["params"]
    pose, joint = partition_params(params)
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state_pose=tx_pose.init(pose),
        opt_state_joint=tx_joint.init(joint),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(cfg: Config, model, backbone=None):
    """Build the jitted train step.

    batch keys: 'input_heatmaps' (B,V,H,W,J) or 'images' (B,V,H,W,3),
    'cameras' (B,V,21), targets ('2d_heatmaps','1d_heatmaps','index',
    'bbox','mask') and meta ('roots_3d','bbox','num_person','joints_3d',
    'joints_3d_vis').
    """
    tx_pose, tx_joint = make_optimizers(cfg)
    target_keys = ("2d_heatmaps", "1d_heatmaps", "index", "bbox", "mask")
    meta_keys = ("roots_3d", "bbox", "num_person", "joints_3d", "joints_3d_vis")

    hm_w, hm_h = cfg.DATASET.HEATMAP_SIZE

    def loss_fn(params, batch_stats, batch, backbone_vars):
        heatmaps = batch.get("input_heatmaps")
        if heatmaps is None and "hm_params" in batch:
            # device-side Gaussian rasterization (ops/heatmap_render.py):
            # the host ships only the 12-float parameterization per
            # (view, person, joint)
            from ..ops.heatmap_render import render_heatmaps_device

            heatmaps = render_heatmaps_device(batch["hm_params"], hm_h, hm_w)
        if heatmaps is None:
            images = batch["images"]  # (B, V, H, W, 3)
            if images.dtype == jnp.uint8:
                # uint8 transfer mode: the loader ships decoded/warped
                # frames and the normalize+RGB swap runs here, fused by
                # XLA into the backbone stem (4x smaller uploads)
                from ..datasets.images import normalize_images_device

                images = normalize_images_device(
                    images, cfg.DATASET.COLOR_RGB
                )
            B, V = images.shape[:2]
            flat = images.reshape((B * V,) + images.shape[2:])
            hm = backbone.apply(
                backbone_vars, flat, train=False, mutable=False
            )
            heatmaps = hm.reshape((B, V) + hm.shape[1:])

        targets = {k: batch[k] for k in target_keys}
        meta = {k: batch[k] for k in meta_keys}
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            heatmaps,
            batch["cameras"],
            targets=targets,
            meta=meta,
            train=True,
            mutable=["batch_stats"],
        )
        losses = out.losses
        total = losses["total"]
        return total, (losses, mutated["batch_stats"])

    def train_step(state: TrainState, batch, backbone_vars=None):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, backbone_vars
        )

        pose_params, joint_params = partition_params(state.params)
        pose_grads, joint_grads = partition_params(grads)

        pose_updates, new_pose_state = tx_pose.update(
            pose_grads, state.opt_state_pose, pose_params
        )
        new_pose_params = optax.apply_updates(pose_params, pose_updates)

        def do_joint(_):
            updates, new_state = tx_joint.update(
                joint_grads, state.opt_state_joint, joint_params
            )
            return optax.apply_updates(joint_params, updates), new_state

        def skip_joint(_):
            return joint_params, state.opt_state_joint

        new_joint_params, new_joint_state = jax.lax.cond(
            losses["joint"] > 0, do_joint, skip_joint, operand=None
        )

        new_params = dict(state.params)
        new_params.update(new_pose_params)
        new_params.update(new_joint_params)

        return (
            TrainState(
                params=new_params,
                batch_stats=new_stats,
                opt_state_pose=new_pose_state,
                opt_state_joint=new_joint_state,
                step=state.step + 1,
            ),
            losses,
        )

    return train_step


class AverageMeter:
    """Running mean tracker (reference function.py:177-192)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0
