"""Top-level FasterVoxelPose model: HDN + JLN + training losses.

Capability parity with lib/models/faster_voxelpose.py, as a single flax
module whose apply is one jit graph per config: optional per-view backbone,
human detection, joint localization, and the four-term training loss
(BEV-heatmap MSE, matched 1D-height MSE, bbox L1 at GT positions, and the
visibility-masked plane + fused joint L1s).  Dynamic person counts are
handled by validity masks over static MAX_PEOPLE slots (identical
semantics to the reference's padded tensors, faster_voxelpose.py:45).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.sampling import build_quad_table
from .hdn import HDNOutputs, HumanDetectionNet
from .jln import JLNOutputs, JointLocalizationNet
from .projection import ProjectionGeometry, make_projection_geometry


def resolve_sampling_spec(cfg: Config):
    """Pick the bilinear-sampling backend: a SampleKernelSpec when the
    Pallas kernel applies (TPU backend, or the interpreter forced; one
    16-joint heatmap group fits VMEM; tile divides the crop), else None
    (quad path).  The kernel itself is exact for any rig/coordinates
    (ops/pallas_sampling.py), so no geometric precondition is needed."""
    import jax

    from ..ops.pallas_sampling import SampleKernelSpec

    backend = cfg.NETWORK.SAMPLING_BACKEND
    if backend == "quad":
        return None
    interpret = bool(cfg.NETWORK.PALLAS_INTERPRET)
    # the kernel is Mosaic (TPU-only): 'auto' requires an actual TPU —
    # never a GPU/CPU — unless the interpreter is forced (tests).  The
    # chip may sit behind a plugin whose platform name is not 'tpu'
    # (e.g. the axon remote tunnel), so also accept a TPU device_kind.
    name = jax.default_backend()
    on_tpu = name == "tpu"
    if not on_tpu and name not in ("cpu", "gpu", "cuda", "rocm"):
        try:
            on_tpu = "tpu" in jax.devices()[0].device_kind.lower()
        except Exception:
            on_tpu = False
    if backend == "auto" and not (on_tpu or interpret):
        return None

    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    V = cfg.DATASET.CAMERA_NUM
    tile = tuple(cfg.NETWORK.PALLAS_TILE)
    exact = bool(cfg.NETWORK.PALLAS_EXACT)
    # bf16-packed fast mode needs 16-aligned y windows (sublane tiles)
    ysub = 8 if exact else 16
    spec = SampleKernelSpec(
        n_views=V,
        height=H,
        width=W,
        num_joints=J,
        tile=tile,
        window_x=int(cfg.NETWORK.PALLAS_WINDOW[0]),
        window_y=-(-int(cfg.NETWORK.PALLAS_WINDOW[1]) // ysub) * ysub,
        exact=exact,
        interpret=interpret and not on_tpu,
        fused_coords=bool(cfg.NETWORK.PALLAS_FUSED_COORDS)
        and not any(d & (d - 1) for d in tile),
    )
    if spec.fused_coords and spec.nx == 1 and spec.ny == 1:
        # sample_tiles_fused requires a multi-window spec; on
        # single-window profiles (heatmaps within one (window_x,
        # window_y) slab, e.g. tiny test geometries) there is no coords
        # HBM traffic worth fusing — fall back to precomputed coords
        import dataclasses

        spec = dataclasses.replace(spec, fused_coords=False)
    # one joint group's packed heatmaps must be VMEM-resident per launch
    # (the bound is independent of J: extra joints become extra groups;
    # fast mode stores bf16, halving the footprint)
    itemsize = jnp.dtype(spec.pack_dtype).itemsize
    ok = (
        V * spec.hp * spec.wp * spec.jp * itemsize <= 12 * 2**20
        and all(v % t == 0 for v, t in zip(cfg.INDIVIDUAL_SPEC.VOXELS_PER_AXIS, tile))
    )
    if not ok:
        if backend == "pallas":
            raise ValueError(
                "SAMPLING_BACKEND 'pallas' requested but the profile does "
                f"not fit the kernel (J={J}, V={V}, heatmap {W}x{H}, tile {tile})"
            )
        return None
    return spec


def resolve_whole_sampling_spec(cfg: Config, crop_spec):
    """Whole-space (HDN) variant of the kernel spec; requires the crop
    spec to be enabled, PALLAS_WHOLE, and the whole-grid tile to divide
    VOXELS_PER_AXIS."""
    import dataclasses

    if crop_spec is None or not cfg.NETWORK.PALLAS_WHOLE:
        return None
    tile = tuple(cfg.NETWORK.PALLAS_WHOLE_TILE)
    if any(v % t for v, t in zip(cfg.CAPTURE_SPEC.VOXELS_PER_AXIS, tile)):
        return None
    ysub = crop_spec.sub
    spec = dataclasses.replace(
        crop_spec,
        tile=tile,
        window_x=int(cfg.NETWORK.PALLAS_WHOLE_WINDOW[0]),
        window_y=-(-int(cfg.NETWORK.PALLAS_WHOLE_WINDOW[1]) // ysub) * ysub,
    )
    # VMEM working-set estimate: resident heatmap group + window slice +
    # the stage-1 output (double-buffered).  The 8x8x20-pillar default
    # measures 20.9MB at the 240x128 profile and compiles/runs on v5e
    # (scripts/sweep_whole.py); past ~24MB the Mosaic stack rejects the
    # kernel at compile time, so 'auto' falls back to quad before that.
    itemsize = jnp.dtype(spec.pack_dtype).itemsize
    vmem = (
        itemsize * spec.n_views * spec.hp * spec.wp * spec.jp  # hm resident
        + itemsize * spec.yw * spec.xw * spec.jp  # window slice
        + 2 * itemsize * spec.xw * spec.jp * spec.padded_samples  # t
    )
    if vmem > 24 * 2**20:
        return None
    return spec


class ModelOutputs(NamedTuple):
    fused_poses: jnp.ndarray  # (B, K, J, 5): xyz, validity flag, score
    plane_poses: jnp.ndarray  # (3, B, K, J, 2)
    proposal_centers: jnp.ndarray  # (B, K, 7)
    losses: Optional[Dict[str, jnp.ndarray]]


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of values over elements where mask (broadcastable) is true;
    0 when the mask is empty — reproduces the reference's early-return
    when no proposal is valid (faster_voxelpose.py:70-78)."""
    mask = jnp.broadcast_to(mask, values.shape).astype(values.dtype)
    total = jnp.sum(values * mask)
    count = jnp.sum(mask)
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


class FasterVoxelPoseNet(nn.Module):
    """The flagship model (reference FasterVoxelPoseNet,
    faster_voxelpose.py:18-105)."""

    cfg: Config
    geom: ProjectionGeometry
    # ops.pallas_sampling.SampleKernelSpec or None (resolved once in
    # build_model; None = XLA quad-gather sampling)
    sampling_spec: Optional[object] = None
    whole_sampling_spec: Optional[object] = None

    @nn.compact
    def __call__(
        self,
        heatmaps: jnp.ndarray,  # (B, V, H, W, J) input 2D joint heatmaps
        cams: jnp.ndarray,  # (B, V, 21) packed per-view cameras
        targets: Optional[Dict[str, jnp.ndarray]] = None,
        meta: Optional[Dict[str, jnp.ndarray]] = None,
        train: bool = False,
    ) -> ModelOutputs:
        cfg = self.cfg
        K = cfg.CAPTURE_SPEC.MAX_PEOPLE
        J = cfg.DATASET.NUM_JOINTS
        B = heatmaps.shape[0]
        dtype = jnp.dtype(cfg.NETWORK.COMPUTE_DTYPE)

        gt_roots = meta.get("roots_3d") if (train and meta) else None
        gt_bbox = meta.get("bbox") if (train and meta) else None
        num_person = meta.get("num_person") if (train and meta) else None

        # one quad table per (sample, view), shared by every quad-path
        # sampling pass (see ops/sampling.py); skipped entirely when both
        # projection stages run through the Pallas kernel
        need_quads = self.sampling_spec is None or self.whole_sampling_spec is None
        quads = (
            jax.vmap(jax.vmap(build_quad_table))(heatmaps) if need_quads else None
        )

        # packed layout for the Pallas sampling kernel
        hm_packed = None
        if self.sampling_spec is not None:
            from ..ops.pallas_sampling import pack_heatmaps

            hm_packed = jax.vmap(
                lambda hm: pack_heatmaps(hm, self.sampling_spec)
            )(heatmaps)

        hdn = HumanDetectionNet(
            geom=self.geom,
            max_people=K,
            min_score=cfg.CAPTURE_SPEC.MIN_SCORE,
            dtype=dtype,
            sampling_spec=self.whole_sampling_spec,
            width=cfg.NETWORK.WIDTH_MULT,
            name="hdn",
        )(quads, cams, train, gt_roots, gt_bbox, num_person,
          hm_packed=hm_packed)

        mask = hdn.proposal_centers[:, :, 3] >= 0  # (B, K)

        jln = JointLocalizationNet(
            geom=self.geom,
            max_people=K,
            beta=cfg.NETWORK.BETA,
            num_joints=J,
            weight_feat_channels=cfg.NETWORK.NUM_CHANNEL_JOINT_FEAT,
            weight_hidden_channels=cfg.NETWORK.NUM_CHANNEL_JOINT_HIDDEN,
            dtype=dtype,
            sampling_spec=self.sampling_spec,
            width=cfg.NETWORK.WIDTH_MULT,
            name="jln",
        )(quads, cams, hdn.proposal_centers, train, hm_packed=hm_packed)

        # eval-time confidence refresh (reference writes JLN confs back
        # into proposal_centers[:, :, 4], joint_localization_net.py:98)
        proposal_centers = hdn.proposal_centers.at[:, :, 4].set(
            jnp.where(mask, jln.confidences, hdn.proposal_centers[:, :, 4])
        )

        losses = None
        if train and targets is not None:
            losses = self._losses(hdn, jln, mask, targets, meta)

        flag_score = proposal_centers[:, :, 3:5][:, :, None, :].repeat(J, axis=2)
        fused5 = jnp.concatenate([jln.fused_poses, flag_score], axis=-1)
        return ModelOutputs(fused5, jln.plane_poses, proposal_centers, losses)

    def _losses(self, hdn: HDNOutputs, jln: JLNOutputs, mask, targets, meta):
        """Training losses (reference faster_voxelpose.py:51-98)."""
        cfg = self.cfg
        B, K = mask.shape
        J = cfg.DATASET.NUM_JOINTS

        proposal2gt = hdn.proposal_centers[:, :, 3]
        p2g = jnp.maximum(proposal2gt, 0.0).astype(jnp.int32)  # (B, K)

        # BEV center-heatmap MSE over the full map
        loss_2d = cfg.TRAIN.LAMBDA_LOSS_2D * jnp.mean(
            (hdn.heatmaps_2d - targets["2d_heatmaps"]) ** 2
        )

        # 1D height MSE on matched proposals only
        matched_1d = jnp.take_along_axis(
            targets["1d_heatmaps"], p2g[..., None], axis=1
        )  # (B, K, Z)
        sq = (hdn.heatmaps_1d - matched_1d) ** 2
        loss_1d = cfg.TRAIN.LAMBDA_LOSS_1D * masked_mean(sq, mask[..., None])

        # bbox-size L1 supervised at GT center positions
        gt_index = targets["index"].astype(jnp.int32)  # (B, Kgt)
        bbox_at_gt = jnp.take_along_axis(
            hdn.bbox_maps, gt_index[..., None], axis=1
        )  # (B, Kgt, 2)
        l1 = jnp.abs(bbox_at_gt - targets["bbox"])
        loss_bbox = cfg.TRAIN.LAMBDA_LOSS_BBOX * masked_mean(
            l1, targets["mask"][..., None]
        )

        # visibility-masked joint L1 per plane + weighted fused term
        gt_joints = meta["joints_3d"].astype(jnp.float32)  # (B, Kgt, J, 3)
        gt_vis = meta["joints_3d_vis"].astype(jnp.float32)  # (B, Kgt, J)
        jsel = jnp.take_along_axis(
            gt_joints, p2g[:, :, None, None].repeat(J, 2).repeat(3, 3), axis=1
        )  # (B, K, J, 3)
        vsel = jnp.take_along_axis(gt_vis, p2g[:, :, None].repeat(J, 2), axis=1)
        vis = vsel[..., None]  # (B, K, J, 1)

        any_valid = jnp.sum(mask) > 0
        mkj = mask[:, :, None, None]  # broadcast over (J, coords)

        def plane_l1(pred, gt2):
            return masked_mean(jnp.abs(pred * vis - gt2 * vis), mkj)

        loss_joint = (
            plane_l1(jln.plane_poses[0], jsel[..., (0, 1)])
            + plane_l1(jln.plane_poses[1], jsel[..., (0, 2)])
            + plane_l1(jln.plane_poses[2], jsel[..., (1, 2)])
            + cfg.TRAIN.LAMBDA_LOSS_FUSED
            * masked_mean(jnp.abs(jln.fused_poses * vis - jsel * vis), mkj)
        )
        loss_joint = jnp.where(any_valid, loss_joint, 0.0)

        return {
            "2d_heatmaps": loss_2d,
            "1d_heatmaps": loss_1d,
            "bbox": loss_bbox,
            "joint": loss_joint,
            "total": loss_2d + loss_1d + loss_bbox + loss_joint,
        }


def build_model(cfg: Config) -> FasterVoxelPoseNet:
    spec = resolve_sampling_spec(cfg)
    return FasterVoxelPoseNet(
        cfg=cfg,
        geom=make_projection_geometry(cfg),
        sampling_spec=spec,
        whole_sampling_spec=resolve_whole_sampling_spec(cfg, spec),
    )
