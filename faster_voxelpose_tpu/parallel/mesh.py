"""Multi-chip scale-out: device mesh construction and sharded train/eval.

The reference is explicitly single-GPU (README.md:96 "we only support
single-GPU training now"); this module is the TPU-native scale-out the
reference lacks.  Design (scaling-book recipe): pick a mesh, annotate
shardings, let XLA insert collectives.

* `data` axis: batch-sharded data parallelism.  Params/optimizer state are
  replicated; the batch (heatmaps, cameras, targets, meta) is sharded on
  its leading axis.  Because every loss is a global masked mean, XLA
  inserts the psum over ICI automatically — no hand-written collectives.
* `view` axis (optional, inference): camera views of one frame are placed
  on different chips; each chip runs the backbone + bilinear sampling for
  its views and the voxel aggregation (the mean over cameras,
  ops/sampling.py:sample_and_mean_views) becomes a psum-mean over ICI.
  This is the model's only cross-view reduction point, identified in
  SURVEY.md §2 (parallelism inventory).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis_name: str = "data"):
    """Place every batch array sharded on its leading (batch) axis."""
    sh = batch_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def make_dp_train_step(cfg: Config, model, mesh: Mesh, backbone=None):
    """Data-parallel train step: replicated state, batch-sharded inputs.

    Under jit with these shardings, gradients of the global-mean losses
    are automatically psum'd across the mesh — the optimizer update runs
    identically (replicated) on every chip.
    """
    from ..engine.trainer import make_train_step

    axis = cfg.PARALLEL.MESH_AXIS_NAME
    step = make_train_step(cfg, model, backbone)
    repl = replicated(mesh)
    bsh = batch_sharding(mesh, axis)

    # in_shardings enforce the contract: state/backbone replicated, every
    # batch leaf sharded on its leading axis (bsh is a pytree prefix for
    # the whole batch dict).  A caller that forgot shard_batch gets its
    # arrays resharded here instead of silently running replicated.
    jitted = jax.jit(
        step,
        in_shardings=(repl, bsh, repl),
        out_shardings=(repl, repl),
    )
    return jitted


def make_dp_eval_step(cfg: Config, model, mesh: Mesh):
    """Data-parallel eval step (batch-sharded inference)."""
    axis = cfg.PARALLEL.MESH_AXIS_NAME
    repl = replicated(mesh)
    bsh = batch_sharding(mesh, axis)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, bsh, bsh),
        out_shardings=bsh,
    )
    def eval_step(variables, heatmaps, cameras):
        out = model.apply(variables, heatmaps, cameras, train=False, mutable=False)
        return out.fused_poses

    return eval_step


def make_view_sharded_forward(cfg: Config, model, mesh: Mesh, axis: str = "data"):
    """Camera-view sharding for latency-critical streaming inference: the
    (B, V, ...) heatmap tensor is sharded along V; the per-view projection
    gather runs fully local and the cross-view mean rides ICI as one psum.
    Requires V % mesh size == 0."""
    repl = replicated(mesh)
    vsh = NamedSharding(mesh, P(None, axis))

    @functools.partial(
        jax.jit,
        in_shardings=(repl, vsh, vsh),
        out_shardings=repl,
    )
    def forward(variables, heatmaps, cameras):
        out = model.apply(variables, heatmaps, cameras, train=False, mutable=False)
        return out.fused_poses

    return forward
