"""Golden-value parity of the full model against the PyTorch reference.

Builds the reference FasterVoxelPoseNet (random init, eval mode) on a tiny
config, converts its weights with utils/weights_torch.convert_model, runs
both pipelines on identical synthetic heatmaps + cameras, and compares
stage outputs and final fused poses.  This validates, in one shot: the
projection geometry, bilinear sampling, all conv-head conversions/layouts,
NMS/top-k decode, soft-argmax, offset arithmetic and plane fusion.
"""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path
from tests.test_geometry import make_camera

# tiny geometry so CPU jit compiles stay fast
TINY = dict(
    ori_image_size=(320, 240),
    image_size=(160, 128),
    heatmap_size=(40, 32),
    space_size=(4000.0, 4000.0, 1600.0),
    space_center=(0.0, 0.0, 800.0),
    voxels=(16, 16, 8),
    ind_voxels=(16, 16, 16),
    ind_space=(2000.0, 2000.0, 2000.0),
    num_joints=5,
    max_people=4,
    min_score=0.1,
    beta=100.0,
    views=3,
)


def build_our_config(profile=None):
    from faster_voxelpose_tpu.config import Config

    TINY = profile or globals()["TINY"]
    cfg = Config()
    cfg.DATASET.ORI_IMAGE_SIZE = TINY["ori_image_size"]
    cfg.DATASET.IMAGE_SIZE = TINY["image_size"]
    cfg.DATASET.HEATMAP_SIZE = TINY["heatmap_size"]
    cfg.DATASET.NUM_JOINTS = TINY["num_joints"]
    cfg.DATASET.CAMERA_NUM = TINY["views"]
    cfg.CAPTURE_SPEC.SPACE_SIZE = TINY["space_size"]
    cfg.CAPTURE_SPEC.SPACE_CENTER = TINY["space_center"]
    cfg.CAPTURE_SPEC.VOXELS_PER_AXIS = TINY["voxels"]
    cfg.CAPTURE_SPEC.MAX_PEOPLE = TINY["max_people"]
    cfg.CAPTURE_SPEC.MIN_SCORE = TINY["min_score"]
    cfg.INDIVIDUAL_SPEC.SPACE_SIZE = TINY["ind_space"]
    cfg.INDIVIDUAL_SPEC.VOXELS_PER_AXIS = TINY["ind_voxels"]
    cfg.NETWORK.BETA = TINY["beta"]
    cfg.NETWORK.COMPUTE_DTYPE = "float32"  # parity runs in f32
    cfg.CAPTURE_SPEC.__post_init__()
    cfg.INDIVIDUAL_SPEC.__post_init__()
    cfg.DATASET.__post_init__()
    return cfg


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def build_ref_config(profile=None):
    """Attribute-compatible config namespace for the reference modules."""
    TINY = profile or globals()["TINY"]
    return _NS(
        DEVICE="cpu",
        DATASET=_NS(
            ORI_IMAGE_SIZE=np.array(TINY["ori_image_size"]),
            IMAGE_SIZE=np.array(TINY["image_size"]),
            HEATMAP_SIZE=np.array(TINY["heatmap_size"]),
            NUM_JOINTS=TINY["num_joints"],
        ),
        CAPTURE_SPEC=_NS(
            SPACE_SIZE=np.array(TINY["space_size"]),
            SPACE_CENTER=np.array(TINY["space_center"]),
            VOXELS_PER_AXIS=np.array(TINY["voxels"]),
            MAX_PEOPLE=TINY["max_people"],
            MIN_SCORE=TINY["min_score"],
        ),
        INDIVIDUAL_SPEC=_NS(
            SPACE_SIZE=np.array(TINY["ind_space"]),
            VOXELS_PER_AXIS=np.array(TINY["ind_voxels"]),
        ),
        NETWORK=_NS(BETA=TINY["beta"], NUM_CHANNEL_JOINT_FEAT=32,
                    NUM_CHANNEL_JOINT_HIDDEN=64),
        TRAIN=_NS(LAMBDA_LOSS_2D=1.0, LAMBDA_LOSS_1D=1.0, LAMBDA_LOSS_BBOX=0.1,
                  LAMBDA_LOSS_FUSED=5.0),
    )


@pytest.fixture(scope="module")
def setup():
    if not add_reference_to_path():
        pytest.skip("reference not available")
    import torch

    torch.manual_seed(0)
    from models.faster_voxelpose import FasterVoxelPoseNet as RefNet

    ref_cfg = build_ref_config()
    ref_model = RefNet(ref_cfg).eval()

    import jax.numpy as jnp
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.utils.weights_torch import convert_model

    cfg = build_our_config()
    model = build_model(cfg)
    variables = convert_model(
        {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    )

    rng = np.random.RandomState(42)
    B, V, J = 2, TINY["views"], TINY["num_joints"]
    W, H = TINY["heatmap_size"]
    heatmaps = rng.rand(B, V, H, W, J).astype(np.float32)
    cam_dicts = [make_camera(s) for s in range(V)]
    # put cameras around the tiny space: re-center their focal geometry
    for c in cam_dicts:
        c["fx"], c["fy"], c["cx"], c["cy"] = 260.0, 260.0, 160.0, 120.0
        c["k"] = c["k"] * 0.2
        c["p"] = c["p"] * 0.2

    from faster_voxelpose_tpu.geometry.cameras import pack_rig

    cams = np.broadcast_to(pack_rig(cam_dicts).astype(np.float32), (B, V, 21))

    return _NS(
        torch=torch,
        ref_model=ref_model,
        ref_cfg=ref_cfg,
        model=model,
        cfg=cfg,
        variables=variables,
        heatmaps=heatmaps,
        cams=np.asarray(cams),
        cam_dicts=cam_dicts,
    )


def _ref_inputs(s):
    """Torch-side inputs mirroring the jax ones."""
    torch = s.torch
    hm_t = torch.from_numpy(
        np.ascontiguousarray(s.heatmaps.transpose(0, 1, 4, 2, 3))
    )
    cameras = {"seq0": s.cam_dicts}
    meta = {"seq": ["seq0"] * s.heatmaps.shape[0]}
    from faster_voxelpose_tpu.geometry.transforms import get_resize_transform

    rt = torch.from_numpy(
        get_resize_transform(TINY["ori_image_size"], TINY["image_size"])
    ).float()
    return hm_t, meta, cameras, rt


def test_whole_projection_parity(setup):
    s = setup
    from models.project_whole import ProjectLayer as RefProject

    ref_layer = RefProject(s.ref_cfg)
    hm_t, meta, cameras, rt = _ref_inputs(s)
    ref_cubes = ref_layer(hm_t, meta, cameras, rt).detach().numpy()  # (B,J,X,Y,Z)

    import jax

    from faster_voxelpose_tpu.models.projection import (
        make_projection_geometry,
        project_whole_batch,
    )
    from faster_voxelpose_tpu.ops.sampling import build_quad_table

    geom = make_projection_geometry(s.cfg)
    quads = jax.vmap(jax.vmap(build_quad_table))(s.heatmaps)
    ours = np.asarray(project_whole_batch(geom, quads, s.cams))
    ours_t = ours.transpose(0, 4, 1, 2, 3)  # channels-last -> torch layout
    np.testing.assert_allclose(ours_t, ref_cubes, rtol=1e-3, atol=2e-4)


def test_full_model_parity(setup):
    s = setup
    torch = s.torch
    hm_t, meta, cameras, rt = _ref_inputs(s)
    with torch.no_grad():
        ref_fused, ref_planes, ref_centers, _, _ = s.ref_model(
            backbone=None, views=None, meta=meta, input_heatmaps=hm_t,
            cameras=cameras, resize_transform=rt,
        )
    ref_fused = ref_fused.numpy()
    ref_centers = ref_centers.numpy()

    out = s.model.apply(
        s.variables, s.heatmaps, s.cams, train=False, mutable=False
    )
    our_fused = np.asarray(out.fused_poses)
    our_centers = np.asarray(out.proposal_centers)

    # With random (untrained) weights, near-tied voxel responses can break
    # differently under f32 conv noise, flipping isolated proposals by one
    # voxel.  Require near-total agreement (catches systematic geometry/
    # decode bugs) and compare values strictly on agreeing slots.
    agree = np.all(
        np.abs(our_centers[:, :, 0:3] - ref_centers[:, :, 0:3]) < 1e-2, axis=-1
    )
    assert agree.mean() >= 0.85, f"proposal agreement too low: {agree.mean()}"

    np.testing.assert_array_equal(
        (our_centers[:, :, 3] >= 0)[agree], (ref_centers[:, :, 3] >= 0)[agree]
    )
    np.testing.assert_allclose(
        our_centers[:, :, 4][agree], ref_centers[:, :, 4][agree],
        rtol=5e-2, atol=5e-4,
    )

    valid = (ref_centers[:, :, 3] >= 0) & agree
    # fused world-mm poses within a fraction of a millimeter
    np.testing.assert_allclose(
        our_fused[valid][:, :, :3], ref_fused[valid][:, :, :3],
        rtol=1e-3, atol=0.5,
    )


def test_loss_parity(setup):
    """Training losses on synthetic targets match the reference math."""
    s = setup
    torch = s.torch
    B, K = s.heatmaps.shape[0], TINY["max_people"]
    J = TINY["num_joints"]
    vx, vy, vz = TINY["voxels"]
    rng = np.random.RandomState(7)

    targets = {
        "2d_heatmaps": rng.rand(B, vx, vy).astype(np.float32),
        "1d_heatmaps": rng.rand(B, K, vz).astype(np.float32),
        "index": rng.randint(0, vx * vy, (B, K)).astype(np.float32),
        "bbox": rng.rand(B, K, 2).astype(np.float32),
        "mask": np.stack(
            [np.arange(K) <= 2, np.arange(K) <= 1], axis=0
        ),
        "offset": np.zeros((B, K, 2), np.float32),
    }
    # GT roots near proposal locations on which OUR and the REF model agree
    # (voxel near-ties under random weights can flip isolated proposals; GT
    # placed only near agreeing ones makes the matched sets identical in
    # both models, so every masked loss term must coincide).  Disagreeing
    # proposals get no GT within 500mm and are dropped by both.
    hm_t0, meta0, cameras0, rt0 = _ref_inputs(s)
    with torch.no_grad():
        _, _, ref_eval_centers, _, _ = s.ref_model(
            backbone=None, views=None, meta=meta0, input_heatmaps=hm_t0,
            cameras=cameras0, resize_transform=rt0,
        )
    eval_out = s.model.apply(s.variables, s.heatmaps, s.cams, train=False,
                             mutable=False)
    our_xyz = np.asarray(eval_out.proposal_centers[:, :, :3])
    ref_xyz = ref_eval_centers.numpy()[:, :, :3]
    agree = np.all(np.abs(our_xyz - ref_xyz) < 1e-2, axis=-1)  # (B, K)

    roots = np.full((B, K, 3), 1e6, np.float32)  # default: far away
    num_person = np.zeros((B,), np.int32)
    for b in range(B):
        picks = np.where(agree[b])[0][:3]
        for gi, p in enumerate(picks):
            roots[b, gi] = our_xyz[b, p] + rng.uniform(-120, 120, 3)
        num_person[b] = len(picks)
    assert (num_person > 0).all(), "no agreeing proposals to anchor GT"
    joints = (
        roots[:, :, None, :] + rng.uniform(-300, 300, (B, K, J, 3))
    ).astype(np.float32)
    vis = (rng.rand(B, K, J) > 0.2).astype(np.float32)
    meta_np = {
        "roots_3d": roots,
        "bbox": targets["bbox"],
        "num_person": num_person,
        "joints_3d": joints,
        "joints_3d_vis": vis,
    }

    hm_t, meta, cameras, rt = _ref_inputs(s)
    meta_t = dict(meta)
    meta_t.update(
        {
            "roots_3d": torch.from_numpy(roots),
            "bbox": torch.from_numpy(targets["bbox"]),
            "num_person": torch.from_numpy(meta_np["num_person"]).long(),
            "joints_3d": torch.from_numpy(joints),
            "joints_3d_vis": torch.from_numpy(vis),
        }
    )
    targets_t = {
        k: torch.from_numpy(np.asarray(v))
        for k, v in targets.items()
    }

    ref_model = s.ref_model.train()
    try:
        with torch.no_grad():
            _, _, _, _, ref_losses = ref_model(
                backbone=None, views=None, meta=meta_t, targets=targets_t,
                input_heatmaps=hm_t, cameras=cameras, resize_transform=rt,
            )
    finally:
        ref_model.eval()

    out, _ = s.model.apply(
        s.variables, s.heatmaps, s.cams, targets=targets, meta=meta_np,
        train=True, mutable=["batch_stats"],
    )
    assert out.losses is not None
    for k in ("2d_heatmaps", "1d_heatmaps", "bbox"):
        ours = float(out.losses[k])
        ref = float(ref_losses[k])
        assert ours == pytest.approx(ref, rel=3e-2, abs=2e-3), (k, ours, ref)
    # Joint loss: deliberate train-time deviation.  The reference runs the
    # JLN per batch sample on the *valid* proposals only
    # (joint_localization_net.py:72-77), so its train-mode BatchNorm batch
    # statistics are computed over per-sample valid-only plane batches; our
    # fixed-shape design runs all B*K slots in one batch.  Same function,
    # different BN batch composition -> train-mode activations differ by
    # design (eval parity, which uses running stats, is exact — see
    # test_full_model_parity).  Sanity-bound the deviation instead.
    ours_j, ref_j = float(out.losses["joint"]), float(ref_losses["joint"])
    assert ours_j == pytest.approx(ref_j, rel=0.35), ("joint", ours_j, ref_j)
