"""Training-engine integration: the dual-optimizer train step runs,
losses are finite, the right partitions update on the right schedule, and
repeated steps on a fixed batch reduce the detection losses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_model_parity import build_our_config
from faster_voxelpose_tpu.engine.trainer import (
    create_train_state,
    make_train_step,
    partition_params,
)
from faster_voxelpose_tpu.models.faster_voxelpose import build_model
from __graft_entry__ import _example_cameras


@pytest.fixture(scope="module")
def setup():
    cfg = build_our_config()
    cfg.TRAIN.ACCUMULATION_STEPS = 2
    cfg.TRAIN.LR = 1e-3
    model = build_model(cfg)

    B, V = 2, cfg.DATASET.CAMERA_NUM
    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    K = cfg.CAPTURE_SPEC.MAX_PEOPLE
    vx, vy, vz = cfg.CAPTURE_SPEC.VOXELS_PER_AXIS

    rng = np.random.RandomState(0)
    cams = _example_cameras(B, V)
    batch = {
        "input_heatmaps": rng.rand(B, V, H, W, J).astype(np.float32) * 0.3,
        "cameras": cams,
        "2d_heatmaps": rng.rand(B, vx, vy).astype(np.float32),
        "1d_heatmaps": rng.rand(B, K, vz).astype(np.float32),
        "index": rng.randint(0, vx * vy, (B, K)).astype(np.float32),
        "bbox": rng.rand(B, K, 2).astype(np.float32) * 0.5 + 0.3,
        "mask": np.tile(np.arange(K) < 2, (B, 1)),
    }

    variables = model.init(
        jax.random.PRNGKey(0), batch["input_heatmaps"][:1], batch["cameras"][:1],
        train=False,
    )

    # anchor GT roots at the model's own train-mode proposal locations
    # (train-mode BatchNorm shifts the BEV heatmap vs eval mode) so the
    # 500mm training matching succeeds and the joint loss is non-zero
    eval_out, _ = model.apply(
        variables, batch["input_heatmaps"], batch["cameras"], train=True,
        mutable=["batch_stats"],
    )
    prop_xyz = np.asarray(eval_out.proposal_centers[:, :, :3])
    roots = (prop_xyz + rng.uniform(-120, 120, prop_xyz.shape)).astype(np.float32)
    batch.update(
        {
            "roots_3d": roots,
            "num_person": np.full((B,), 2, np.int32),
            "joints_3d": (
                roots[:, :, None, :] + rng.uniform(-200, 200, (B, K, J, 3))
            ).astype(np.float32),
            "joints_3d_vis": np.ones((B, K, J), np.float32),
        }
    )
    state = create_train_state(cfg, variables)
    step = jax.jit(make_train_step(cfg, model))
    return cfg, model, state, step, batch


def test_train_steps_reduce_detection_loss(setup):
    cfg, model, state, step, batch = setup
    first = last = None
    for i in range(8):
        state, losses = step(state, batch, None)
        total_det = float(losses["2d_heatmaps"]) + float(losses["1d_heatmaps"])
        assert np.isfinite(float(losses["total"])), f"non-finite loss at step {i}"
        if first is None:
            first = total_det
        last = total_det
    # fixed batch + Adam: detection losses must drop substantially
    assert last < first * 0.9, (first, last)


def test_pose_partition_steps_on_schedule(setup):
    cfg, model, state, step, batch = setup
    p0 = state.params["hdn"]
    j0 = state.params["jln"]

    state1, losses1 = step(state, batch, None)
    assert float(losses1["joint"]) > 0, "test setup: joint loss must be active"
    # accumulation_steps=2: pose partition unchanged after 1 step
    d_pose = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.sum(jnp.abs(a - b))), p0, state1.params["hdn"]),
    )
    d_joint = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.sum(jnp.abs(a - b))), j0, state1.params["jln"]),
    )
    assert d_pose == 0.0, "HDN updated before accumulation boundary"
    assert d_joint > 0.0, "JLN failed to update"

    state2, _ = step(state1, batch, None)
    d_pose2 = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.sum(jnp.abs(a - b))), p0, state2.params["hdn"]),
    )
    assert d_pose2 > 0.0, "HDN failed to update at accumulation boundary"
