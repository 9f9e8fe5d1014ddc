"""Human Detection Network: whole-space cube -> per-person 3D center
proposals with confidences and bbox sizes.

Capability parity with lib/models/human_detection_net.py, rebuilt as a
fixed-shape functional pipeline: projection (models/projection.py) ->
CenterNet BEV heads -> maxpool-NMS top-K -> batched gather of bbox
predictions and 1D z-columns -> C2CNet height decode -> proposal assembly.
All gathers are static-K jnp.take_along_axis; the training-time GT matching
(reference ProposalLayer.filter_proposal, human_detection_net.py:25-42) is
re-expressed as a masked vectorized min instead of Python loops.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.nms import nms2d_topk
from .cnns import C2CNet, CenterNet
from .projection import (
    ProjectionGeometry,
    project_whole_batch,
    project_whole_batch_pallas,
)


class HDNOutputs(NamedTuple):
    heatmaps_2d: jnp.ndarray  # (B, X, Y) BEV center heatmap
    heatmaps_1d: jnp.ndarray  # (B, K, Z) per-proposal height heatmaps
    bbox_maps: jnp.ndarray  # (B, X*Y, 2) dense bbox-size regression
    proposal_centers: jnp.ndarray  # (B, K, 7)
    feature_cubes: jnp.ndarray  # (B, X, Y, Z, J) whole-space volume


def match_proposals_to_gt(
    centers_mm: jnp.ndarray,  # (B, K, 3) proposal real-world centers
    bbox_preds: jnp.ndarray,  # (B, K, 2)
    gt_roots: jnp.ndarray,  # (B, Kgt, 3)
    gt_bbox: jnp.ndarray,  # (B, Kgt, 2)
    num_person: jnp.ndarray,  # (B,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized training-time matching: each proposal is assigned its
    nearest GT root (index), or -1 beyond 500mm; matched bbox predictions
    are floored by the GT bbox when any coordinate underestimates it by
    more than 0.1 (reference filter_proposal, human_detection_net.py:25-42).
    """
    B, K, _ = centers_mm.shape
    Kgt = gt_roots.shape[1]
    gt_valid = jnp.arange(Kgt)[None, :] < num_person[:, None]  # (B, Kgt)

    diff = centers_mm[:, :, None, :] - gt_roots[:, None, :, :]  # (B, K, Kgt, 3)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    dist = jnp.where(gt_valid[:, None, :], dist, jnp.inf)
    min_gt = jnp.argmin(dist, axis=-1)  # (B, K)
    min_dist = jnp.min(dist, axis=-1)
    proposal2gt = jnp.where(min_dist > 500.0, -1.0, min_gt.astype(jnp.float32))

    matched_gt_bbox = jnp.take_along_axis(gt_bbox, min_gt[..., None], axis=1)
    underestimates = jnp.any(bbox_preds < matched_gt_bbox - 0.1, axis=-1)
    replace = (proposal2gt >= 0) & underestimates
    bbox_out = jnp.where(replace[..., None], matched_gt_bbox, bbox_preds)
    return proposal2gt, bbox_out


class HumanDetectionNet(nn.Module):
    """Config-static HDN (reference HumanDetectionNet,
    human_detection_net.py:67-104)."""

    geom: ProjectionGeometry
    max_people: int
    min_score: float
    dtype: Any = jnp.float32
    # SampleKernelSpec (whole-space tiling) or None = quad path
    sampling_spec: Any = None
    width: float = 1.0  # trunk width multiplier (NETWORK.WIDTH_MULT)

    @nn.compact
    def __call__(
        self,
        quads: jnp.ndarray,  # (B, V, H*W, 4, J) quad tables (ops/sampling.py)
        cams: jnp.ndarray,  # (B, V, 21)
        train: bool = False,
        gt_roots: Optional[jnp.ndarray] = None,  # (B, Kgt, 3)
        gt_bbox: Optional[jnp.ndarray] = None,  # (B, Kgt, 2)
        num_person: Optional[jnp.ndarray] = None,  # (B,)
        hm_packed: jnp.ndarray = None,  # (B, V, H, W*JP) when pallas
    ) -> HDNOutputs:
        geom = self.geom
        B = cams.shape[0]
        K = self.max_people
        vx, vy, vz = geom.voxels_per_axis

        if self.sampling_spec is not None:
            cubes = project_whole_batch_pallas(
                geom, hm_packed, cams, self.sampling_spec
            )
        else:
            cubes = project_whole_batch(geom, quads, cams)  # (B, X, Y, Z, J)

        hm, size = CenterNet(dtype=self.dtype, width=self.width,
                             name="center_net")(cubes, train)
        hm2d = hm[..., 0]  # (B, X, Y)

        # NMS + top-K on a detached copy (proposal selection carries no
        # gradient; reference human_detection_net.py:85)
        confs2d, idx2d, flat2d = nms2d_topk(jax.lax.stop_gradient(hm2d), K)

        # matched bbox predictions at proposal positions
        bbox_flat = size.reshape(B, vx * vy, 2)
        match_bbox = jnp.take_along_axis(bbox_flat, flat2d[..., None], axis=1)

        # per-proposal 1D feature columns: (B, X*Y, Z, J) gather -> (B, K, Z, J)
        cube_flat = cubes.reshape(B, vx * vy, vz, -1)
        cols = jnp.take_along_axis(cube_flat, flat2d[:, :, None, None], axis=1)

        hm1d = C2CNet(dtype=self.dtype, width=self.width, name="c2c_net")(
            cols.reshape(B * K, vz, -1), train
        ).reshape(B, K, vz)

        hm1d_d = jax.lax.stop_gradient(hm1d)
        conf1d = jnp.max(hm1d_d, axis=-1)  # (B, K)
        idx1d = jnp.argmax(hm1d_d, axis=-1)

        # voxel indices -> real-world mm (reference ProposalLayer, :22-23,:49)
        voxel_idx = jnp.concatenate([idx2d, idx1d[..., None]], axis=-1)  # (B,K,3)
        space = jnp.asarray(geom.space_size, jnp.float32)
        voxn = jnp.asarray(geom.voxels_per_axis, jnp.float32)
        center_space = jnp.asarray(geom.space_center, jnp.float32)
        scale = space / (voxn - 1)
        bias = center_space - space / 2.0
        centers_mm = voxel_idx.astype(jnp.float32) * scale + bias

        confs = confs2d * conf1d  # 2D x 1D confidence product (:101)

        if train and gt_roots is not None:
            proposal2gt, match_bbox = match_proposals_to_gt(
                centers_mm, match_bbox, gt_roots, gt_bbox, num_person
            )
        else:
            proposal2gt = (confs > self.min_score).astype(jnp.float32) - 1.0

        proposal_centers = jnp.concatenate(
            [
                centers_mm,  # 0:3 xyz mm
                proposal2gt[..., None],  # 3 matched GT id / validity flag
                confs[..., None],  # 4 confidence
                match_bbox,  # 5:7 bbox size (normalized)
            ],
            axis=-1,
        )
        return HDNOutputs(hm2d, hm1d, bbox_flat, proposal_centers, cubes)
