"""Golden parity against the PyTorch reference at the REAL Panoptic
profile (240x128 heatmaps, 80x80x20 whole grid, 64^3 crops, K=10, J=15,
5 views, MIN_SCORE=0.3) with realistic dome cameras — the shapes the
released models run at, previously only tested at tiny shapes.

Slow-marked (one frame through both frameworks on CPU takes minutes of
compile): run with  pytest tests/test_full_profile_parity.py -m slow
"""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path
from tests.test_model_parity import _NS, build_our_config, build_ref_config

pytestmark = pytest.mark.slow

FULL = dict(
    ori_image_size=(1920, 1080),
    image_size=(960, 512),
    heatmap_size=(240, 128),
    space_size=(8000.0, 8000.0, 2000.0),
    space_center=(0.0, -500.0, 800.0),
    voxels=(80, 80, 20),
    ind_voxels=(64, 64, 64),
    ind_space=(2000.0, 2000.0, 2000.0),
    num_joints=15,
    max_people=10,
    # the real profile uses 0.3, but random-init CenterNet confidences
    # are ~N(0, 1e-3) — force every slot valid so the JLN path is
    # exercised end-to-end at full shapes (bench.py does the same)
    min_score=-1e9,
    beta=100.0,
    views=5,
)


def make_dome_camera(idx, n_views=5):
    """A plausible Panoptic HD camera (shared rig generator)."""
    from faster_voxelpose_tpu.geometry.example_rigs import dome_camera

    return dome_camera(idx, n_views, space_center=FULL["space_center"],
                       ori_image_size=FULL["ori_image_size"])


@pytest.fixture(scope="module")
def setup():
    if not add_reference_to_path():
        pytest.skip("reference not available")
    import torch

    torch.manual_seed(0)
    from models.faster_voxelpose import FasterVoxelPoseNet as RefNet

    ref_cfg = build_ref_config(FULL)
    ref_model = RefNet(ref_cfg).eval()

    from faster_voxelpose_tpu.geometry.cameras import pack_rig
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.utils.weights_torch import convert_model

    cfg = build_our_config(FULL)
    model = build_model(cfg)
    variables = convert_model(
        {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    )

    rng = np.random.RandomState(42)
    B, V, J = 1, FULL["views"], FULL["num_joints"]
    W, H = FULL["heatmap_size"]
    # structured heatmaps: a few gaussian blobs per view + noise floor, so
    # the BEV peaks are person-like rather than uniform noise
    heatmaps = rng.rand(B, V, H, W, J).astype(np.float32) * 0.2
    yy, xx = np.mgrid[0:H, 0:W]
    for v in range(V):
        for _ in range(6):
            cx_, cy_ = rng.uniform(20, W - 20), rng.uniform(10, H - 10)
            blob = np.exp(-((xx - cx_) ** 2 + (yy - cy_) ** 2) / (2 * 4.0**2))
            j = rng.randint(J)
            heatmaps[0, v, :, :, j] = np.maximum(
                heatmaps[0, v, :, :, j], blob.astype(np.float32)
            )

    cam_dicts = [make_dome_camera(i, V) for i in range(V)]
    cams = np.broadcast_to(pack_rig(cam_dicts).astype(np.float32), (B, V, 21))

    return _NS(
        torch=torch, ref_model=ref_model, ref_cfg=ref_cfg, model=model,
        cfg=cfg, variables=variables, heatmaps=heatmaps,
        cams=np.asarray(cams), cam_dicts=cam_dicts,
    )


def _ref_inputs(s):
    torch = s.torch
    hm_t = torch.from_numpy(
        np.ascontiguousarray(s.heatmaps.transpose(0, 1, 4, 2, 3))
    )
    cameras = {"seq0": s.cam_dicts}
    meta = {"seq": ["seq0"] * s.heatmaps.shape[0]}
    from faster_voxelpose_tpu.geometry.transforms import get_resize_transform

    rt = torch.from_numpy(
        get_resize_transform(FULL["ori_image_size"], FULL["image_size"])
    ).float()
    return hm_t, meta, cameras, rt


def test_whole_projection_parity_full_profile(setup):
    s = setup
    from models.project_whole import ProjectLayer as RefProject

    ref_layer = RefProject(s.ref_cfg)
    hm_t, meta, cameras, rt = _ref_inputs(s)
    ref_cubes = ref_layer(hm_t, meta, cameras, rt).detach().numpy()

    import jax

    from faster_voxelpose_tpu.models.projection import (
        make_projection_geometry,
        project_whole_batch,
    )
    from faster_voxelpose_tpu.ops.sampling import build_quad_table

    geom = make_projection_geometry(s.cfg)
    quads = jax.vmap(jax.vmap(build_quad_table))(s.heatmaps)
    ours = np.asarray(project_whole_batch(geom, quads, s.cams))
    np.testing.assert_allclose(
        ours.transpose(0, 4, 1, 2, 3), ref_cubes, rtol=1e-3, atol=2e-4
    )


def test_full_model_parity_full_profile(setup):
    """Fused world-mm poses at the released-model shapes: <=0.5mm against
    the reference on agreeing proposals, >=85% proposal agreement."""
    s = setup
    torch = s.torch
    hm_t, meta, cameras, rt = _ref_inputs(s)
    with torch.no_grad():
        ref_fused, _, ref_centers, _, _ = s.ref_model(
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

    agree = np.all(
        np.abs(our_centers[:, :, 0:3] - ref_centers[:, :, 0:3]) < 1e-2, axis=-1
    )
    assert agree.mean() >= 0.85, f"proposal agreement too low: {agree.mean()}"
    np.testing.assert_array_equal(
        (our_centers[:, :, 3] >= 0)[agree], (ref_centers[:, :, 3] >= 0)[agree]
    )

    valid = (ref_centers[:, :, 3] >= 0) & agree
    if valid.any():
        np.testing.assert_allclose(
            our_fused[valid][:, :, :3], ref_fused[valid][:, :, :3],
            rtol=1e-3, atol=0.5,
        )
    # the structured heatmaps must actually produce detections
    assert (ref_centers[:, :, 3] >= 0).sum() > 0, "no proposals detected"
