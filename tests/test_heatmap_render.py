"""Device-side Gaussian rasterization (ops/heatmap_render.py) parity with
the host renderer (datasets/base.py render_heatmap), including the
augmentation path: both consume the SAME RNG draws in the same order, so
with equal seeds the outputs must match to float tolerance.
"""

import jax
import numpy as np
import pytest

from faster_voxelpose_tpu.datasets.base import PoseDatasetBase
from faster_voxelpose_tpu.ops.heatmap_render import render_heatmaps_device
from tests.test_datasets import make_people, small_cfg


def _dataset(aug, seed=7, num_joints=15):
    cfg = small_cfg(num_joints=num_joints)
    cfg.TRAIN.SEED = seed
    ds = PoseDatasetBase(cfg, is_train=True)
    ds.data_augmentation = aug
    return ds


def _joints_2d(rng, n, num_joints, W, H):
    """Direct 2D joints in the input-image frame (bypasses projection)."""
    joints, vis = [], []
    for _ in range(n):
        c = rng.uniform([100, 100], [W - 100, H - 100])
        j = c[None, :] + rng.uniform(-120, 120, (num_joints, 2))
        joints.append(j.astype(np.float64))
        vis.append(rng.rand(num_joints) > 0.1)
    return joints, vis


@pytest.mark.parametrize("aug", [False, True])
def test_device_matches_host(aug):
    W, H = 960, 512
    rng = np.random.RandomState(3)
    joints, vis = _joints_2d(rng, 3, 15, W, H)

    host = _dataset(aug).render_heatmap(joints, vis)  # (Hh, Wh, J)
    params = _dataset(aug).render_heatmap_params(joints, vis)  # same draws

    Wh, Hh = 240, 128
    dev = np.asarray(
        jax.jit(lambda p: render_heatmaps_device(p, Hh, Wh))(params[None])
    )[0]
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, atol=2e-5)


def test_device_matches_host_offscreen_and_empty():
    """Joints straddling image edges + a person with empty visibility."""
    W, H = 960, 512
    rng = np.random.RandomState(11)
    joints, vis = _joints_2d(rng, 2, 15, W, H)
    joints[0] += np.array([900.0, 480.0])  # push mostly off-screen
    vis[1][:] = False

    host = _dataset(False).render_heatmap(joints, vis)
    params = _dataset(False).render_heatmap_params(joints, vis)
    dev = np.asarray(
        jax.jit(lambda p: render_heatmaps_device(p, 128, 240))(params[None])
    )[0]
    np.testing.assert_allclose(dev, host, atol=2e-5)


def test_dataset_emits_params_in_device_mode():
    from faster_voxelpose_tpu.datasets.base import FrameRecord
    from tests.test_geometry import make_camera

    cfg = small_cfg()
    cfg.DATASET.TRAIN_HEATMAP_SRC = "gt"
    cfg.DATASET.CAMERA_NUM = 2

    rng = np.random.RandomState(5)
    joints, vis = make_people(rng, 2, 15)
    rec = FrameRecord(
        seq="s", joints_3d=np.asarray(joints),
        joints_3d_vis=np.stack([v for v in vis]),
    )

    def build(device_render):
        cfg.DATASET.DEVICE_RENDER = device_render
        ds = PoseDatasetBase(cfg, is_train=True)
        ds.records = [rec]
        ds.cameras = {"s": [make_camera(i) for i in range(2)]}
        return ds

    sample_host = build(False)[0]
    sample_dev = build(True)[0]
    assert "input_heatmaps" in sample_host and "hm_params" not in sample_host
    assert "hm_params" in sample_dev and "input_heatmaps" not in sample_dev
    K, J = cfg.CAPTURE_SPEC.MAX_PEOPLE, 15
    assert sample_dev["hm_params"].shape == (2, K, J, 12)

    W, H = cfg.DATASET.HEATMAP_SIZE
    dev = np.asarray(
        jax.jit(lambda p: render_heatmaps_device(p, H, W))(
            sample_dev["hm_params"][None]
        )
    )[0]
    np.testing.assert_allclose(dev, sample_host["input_heatmaps"], atol=2e-5)


def test_trainer_accepts_hm_params():
    """The jitted train step renders hm_params in-graph and matches the
    rendered-heatmap step's losses."""
    from __graft_entry__ import _example_cameras
    from faster_voxelpose_tpu.engine.trainer import (
        create_train_state,
        make_train_step,
    )
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from tests.test_model_parity import build_our_config

    cfg = build_our_config()
    model = build_model(cfg)

    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    V = cfg.DATASET.CAMERA_NUM
    K = cfg.CAPTURE_SPEC.MAX_PEOPLE
    B = 1
    vx, vy, vz = cfg.CAPTURE_SPEC.VOXELS_PER_AXIS

    nprng = np.random.RandomState(1)
    batch = {
        "input_heatmaps": nprng.rand(B, V, H, W, J).astype(np.float32) * 0.3,
        "cameras": _example_cameras(B, V),
        "2d_heatmaps": nprng.rand(B, vx, vy).astype(np.float32),
        "1d_heatmaps": nprng.rand(B, K, vz).astype(np.float32),
        "index": nprng.randint(0, vx * vy, (B, K)).astype(np.float32),
        "bbox": nprng.rand(B, K, 2).astype(np.float32) * 0.5 + 0.3,
        "mask": np.tile(np.arange(K) < 2, (B, 1)),
        "roots_3d": np.zeros((B, K, 3), np.float32),
        "num_person": np.full((B,), 2, np.int32),
        "joints_3d": np.zeros((B, K, J, 3), np.float32),
        "joints_3d_vis": np.ones((B, K, J), np.float32),
    }

    # params describing one gaussian per (view, person 0, joint)
    rng = nprng
    params = np.zeros((B, V, K, J, 12), np.float32)
    params[:, :, 0, :, 0] = rng.uniform(20, W - 20, (B, V, J))
    params[:, :, 0, :, 1] = rng.uniform(20, H - 20, (B, V, J))
    params[:, :, 0, :, 2] = 1.0 / (2.0 * 3.0**2)
    params[:, :, 0, :, 3] = 1.0
    params[:, :, 0, :, 5] = W
    params[:, :, 0, :, 7] = H

    batch_p = {k: v for k, v in batch.items() if k != "input_heatmaps"}
    batch_p["hm_params"] = params

    variables = model.init(
        jax.random.PRNGKey(0), batch["input_heatmaps"], batch["cameras"],
        train=False,
    )
    step = jax.jit(make_train_step(cfg, model))
    state = create_train_state(cfg, variables)
    state2, losses = step(state, batch_p, None)
    assert np.isfinite(float(losses["total"]))

    # equivalence: explicit render -> input_heatmaps gives identical loss
    from faster_voxelpose_tpu.ops.heatmap_render import render_heatmaps_device

    batch_r = dict(batch)
    batch_r["input_heatmaps"] = np.asarray(
        jax.jit(lambda p: render_heatmaps_device(p, H, W))(params)
    )
    state3, losses_r = step(create_train_state(cfg, variables), batch_r, None)
    np.testing.assert_allclose(
        float(losses["total"]), float(losses_r["total"]), rtol=1e-5
    )
