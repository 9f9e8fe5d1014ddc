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


class PipelinedStream:
    """Two-stage backbone->fusion software pipeline across two chips for
    streaming inference (the pipeline-parallel analogue named in
    SURVEY.md §2: the reference has no distributed execution at all;
    its closest structure is the sequential backbone -> fusion call in
    lib/models/faster_voxelpose.py:36-48).

    Stage 0 (device d0) runs the per-view ResNet backbone on frame t;
    stage 1 (device d1) runs projection + HDN + JLN on frame t-1's
    heatmaps.  Both stages are dispatched asynchronously each `push`,
    so on real hardware d0 and d1 execute concurrently and steady-state
    throughput is max(stage) instead of sum(stage) — at the Panoptic
    profile (backbone 5.8ms, fusion 7.9ms on v5e) that projects ~126
    fps for the two-chip stream vs ~73 fps single-chip, at one frame
    of added latency.  The inter-stage (V, H, W, J) heatmap tensor
    rides ICI via an async device_put.

    Results come back with a one-frame lag: push(frame_t) returns the
    poses of frame t-1 (None for the first frame); flush() drains the
    final in-flight frame.
    """

    def __init__(self, cfg: Config, model, backbone, variables,
                 backbone_vars, cams, devices=None):
        devs = list(devices) if devices is not None else jax.devices()[:2]
        self.d0 = devs[0]
        self.d1 = devs[1] if len(devs) > 1 else devs[0]

        self._bv = jax.device_put(backbone_vars, self.d0)
        self._vars = jax.device_put(variables, self.d1)
        cams = np.asarray(cams)
        if cams.ndim == 2:  # (V, 21) -> add batch dim
            cams = cams[None]
        self._cams = jax.device_put(cams, self.d1)

        @jax.jit
        def bb_step(bv, images):  # (V, ih, iw, 3) -> (V, H, W, J)
            return backbone.apply(bv, images, train=False, mutable=False)

        @jax.jit
        def fuse_step(variables, hm, cams):
            out = model.apply(
                variables, hm[None], cams, train=False, mutable=False
            )
            return out.fused_poses[0], out.proposal_centers[0]

        self._bb_step = bb_step
        self._fuse_step = fuse_step
        self._pending = None  # frame t-1's heatmaps, resident on d1

    def _dispatch_fuse(self):
        fused, centers = self._fuse_step(self._vars, self._pending, self._cams)
        return np.asarray(fused), np.asarray(centers)

    def push(self, images):
        """Feed frame t's (V, ih, iw, 3) images; returns frame t-1's
        (fused_poses, proposal_centers) or None on the first frame."""
        images = jax.device_put(np.asarray(images, np.float32), self.d0)
        hm = self._bb_step(self._bv, images)  # queues on d0 (async)
        out = self._dispatch_fuse() if self._pending is not None else None
        # d0 -> d1 transfer of frame t's heatmaps (async; ICI on TPU)
        self._pending = jax.device_put(hm, self.d1)
        return out

    def flush(self):
        """Drain the final in-flight frame."""
        if self._pending is None:
            return None
        out = self._dispatch_fuse()
        self._pending = None
        return out


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
