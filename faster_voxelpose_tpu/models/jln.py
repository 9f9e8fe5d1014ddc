"""Joint Localization Network: per-proposal fine volumes -> orthographic
plane heatmaps -> soft-argmax -> learned per-joint plane fusion.

Capability parity with lib/models/joint_localization_net.py, rebuilt
fixed-shape: the reference's per-batch-item and per-person Python loops
(joint_localization_net.py:72, project_individual.py:124) become vmaps
over all B*K proposal slots; invalid slots are computed anyway and masked
(their outputs are multiplied to zero), which is the XLA-native form of
the reference's `continue` control flow.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.soft_argmax import soft_argmax
from .cnns import P2PNet, WeightNet
from .projection import (
    ProjectionGeometry,
    compute_crop_origin,
    project_individual_planes,
    project_individual_planes_pallas,
)


class JLNOutputs(NamedTuple):
    fused_poses: jnp.ndarray  # (B, K, J, 3) world mm
    plane_poses: jnp.ndarray  # (3, B, K, J, 2) per-plane 2D estimates
    confidences: jnp.ndarray  # (B, K) soft-argmax confidences


def fuse_plane_poses(plane_poses: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted fusion of the three plane estimates into xyz.

    Each world axis appears in exactly two planes; its two weights are
    normalized and the estimates blended
    (reference fuse_pose_preds, joint_localization_net.py:44-62).

    Args:
      plane_poses: (3, N, J, 2) [xy, xz, yz] plane coordinates.
      weights: (3, N, J, 1) per-plane per-joint weights in (0,1).
    Returns: (N, J, 3).
    """
    xy_w, xz_w, yz_w = weights[0], weights[1], weights[2]
    xy, xz, yz = plane_poses[0], plane_poses[1], plane_poses[2]

    def blend(wa, wb, a, b):
        tot = wa + wb
        return (wa * a + wb * b) / tot

    x = blend(xy_w[..., 0], xz_w[..., 0], xy[..., 0], xz[..., 0])
    y = blend(xy_w[..., 0], yz_w[..., 0], xy[..., 1], yz[..., 0])
    z = blend(xz_w[..., 0], yz_w[..., 0], xz[..., 1], yz[..., 1])
    return jnp.stack([x, y, z], axis=-1)


class JointLocalizationNet(nn.Module):
    """Config-static JLN (reference JointLocalizationNet,
    joint_localization_net.py:36-100)."""

    geom: ProjectionGeometry
    max_people: int
    beta: float
    num_joints: int
    weight_feat_channels: int = 32
    weight_hidden_channels: int = 64
    dtype: Any = jnp.float32
    # ops.pallas_sampling.SampleKernelSpec (hashable dataclass) enabling
    # the Pallas matmul-gather crop path; None = XLA quad-gather path
    sampling_spec: Any = None
    width: float = 1.0  # trunk width multiplier (NETWORK.WIDTH_MULT)

    @nn.compact
    def __call__(
        self,
        quads: jnp.ndarray,  # (B, V, H*W, 4, J) quad tables
        cams: jnp.ndarray,  # (B, V, 21)
        proposal_centers: jnp.ndarray,  # (B, K, 7) — treated as constant
        train: bool = False,
        hm_packed: jnp.ndarray = None,  # (B, V, H, W*JP) when pallas
    ) -> JLNOutputs:
        geom = self.geom
        B, V = cams.shape[0], cams.shape[1]
        K = self.max_people
        J = self.num_joints
        vx, vy, vz = geom.ind_voxels_per_axis

        proposal_centers = jax.lax.stop_gradient(proposal_centers)
        mask = proposal_centers[:, :, 3] >= 0  # (B, K)

        centers_tl, offsets = compute_crop_origin(geom, proposal_centers[..., :3])
        bbox_sizes = proposal_centers[..., 5:7]

        # per-sample, per-person fine crops fused with the orthographic
        # max-projections; plane order [xy, xz, yz]
        # (reference joint_localization_net.py:80-81).  The 64^3 cubes are
        # never materialized across people (see project_individual_planes).
        n = B * K
        if self.sampling_spec is not None:
            spec = self.sampling_spec
            plane_xy, plane_xz, plane_yz = jax.vmap(
                lambda hp, cam, tl, bb, v: project_individual_planes_pallas(
                    geom, hp, cam, tl, bb, v, spec
                )
            )(hm_packed, cams, centers_tl, bbox_sizes, mask)
        else:
            plane_xy, plane_xz, plane_yz = jax.vmap(
                lambda q, cam, tl, bb, v: project_individual_planes(
                    geom, q, cam, tl, bb, v
                )
            )(quads, cams, centers_tl, bbox_sizes, mask)
        plane_xy = plane_xy.reshape(n, vx, vy, J)
        plane_xz = plane_xz.reshape(n, vx, vz, J)
        plane_yz = plane_yz.reshape(n, vy, vz, J)
        planes = jnp.concatenate([plane_xy, plane_xz, plane_yz], axis=0)  # (3n,...)

        # shared plane-to-pose U-Net over all three planes at once
        feats = P2PNet(J, dtype=self.dtype, width=self.width,
                       name="p2p_net")(planes, train)  # (3n,X,Y,J)

        # soft-argmax against each plane's world-coordinate grid
        feats_flat = feats.reshape(3, n, vx * vy, J).transpose(0, 1, 3, 2)
        plane_poses, confs = soft_argmax(
            feats_flat, jnp.asarray(geom.center_grids), self.beta
        )  # (3, n, J, 2), (n,)

        # add each crop's millimeter offset (reference :87-90)
        off = offsets.reshape(n, 1, 3)
        plane_poses = plane_poses.at[0].add(off[..., (0, 1)])
        plane_poses = plane_poses.at[1].add(off[..., (0, 2)])
        plane_poses = plane_poses.at[2].add(off[..., (1, 2)])

        # learned per-joint plane weights + fusion
        weights = WeightNet(
            self.weight_feat_channels,
            self.weight_hidden_channels,
            dtype=self.dtype,
            name="weight_net",
        )(feats, train).reshape(3, n, J, 1)
        fused = fuse_plane_poses(plane_poses, weights)  # (n, J, 3)

        # zero out invalid proposal slots (reference writes only into
        # masked rows of a zero tensor, joint_localization_net.py:96-98)
        m = mask.reshape(n, 1, 1).astype(fused.dtype)
        fused = (fused * m).reshape(B, K, J, 3)
        plane_poses = (plane_poses * m[None]).reshape(3, B, K, J, 2)
        confs = (confs * mask.reshape(n)).reshape(B, K)

        return JLNOutputs(fused, plane_poses, confs)
