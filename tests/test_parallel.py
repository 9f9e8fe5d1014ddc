"""Multi-device sharding tests on the 8-virtual-device CPU mesh:
data-parallel eval and camera-view-sharded streaming inference must
compile, run, and agree with the single-device result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_model_parity import build_our_config
from faster_voxelpose_tpu.models.faster_voxelpose import build_model
from faster_voxelpose_tpu.parallel.mesh import (
    make_dp_eval_step,
    make_mesh,
    make_view_sharded_forward,
    replicated,
    shard_batch,
)
from __graft_entry__ import _example_cameras


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = build_our_config()
    cfg.DATASET.CAMERA_NUM = 4  # shardable view count
    model = build_model(cfg)

    B, V = 8, 4
    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    rng = np.random.RandomState(0)
    heatmaps = rng.rand(B, V, H, W, J).astype(np.float32)
    cams = _example_cameras(B, V)
    variables = model.init(
        jax.random.PRNGKey(0), heatmaps[:1], cams[:1], train=False
    )

    @jax.jit
    def single(variables, hm, cams):
        return model.apply(variables, hm, cams, train=False, mutable=False).fused_poses

    ref = np.asarray(single(variables, heatmaps, cams))
    return cfg, model, variables, heatmaps, cams, ref


def test_dp_eval_matches_single_device(setup):
    cfg, model, variables, heatmaps, cams, ref = setup
    mesh = make_mesh(8)
    eval_step = make_dp_eval_step(cfg, model, mesh)
    out = np.asarray(eval_step(jax.device_put(variables, replicated(mesh)),
                               heatmaps, cams))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)


def test_view_sharded_forward_matches(setup):
    cfg, model, variables, heatmaps, cams, ref = setup
    mesh = make_mesh(4)  # V=4 views over 4 devices
    fwd = make_view_sharded_forward(cfg, model, mesh)
    out = np.asarray(
        fwd(jax.device_put(variables, replicated(mesh)), heatmaps, cams)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)


def _train_batch(cfg, B, rng):
    V = cfg.DATASET.CAMERA_NUM
    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    K = cfg.CAPTURE_SPEC.MAX_PEOPLE
    vx, vy, vz = cfg.CAPTURE_SPEC.VOXELS_PER_AXIS
    roots = rng.uniform(-1200, 1200, (B, K, 3)).astype(np.float32)
    roots[..., 2] = rng.uniform(600, 1000, (B, K))
    return {
        "input_heatmaps": rng.rand(B, V, H, W, J).astype(np.float32) * 0.4,
        "cameras": _example_cameras(B, V),
        "2d_heatmaps": rng.rand(B, vx, vy).astype(np.float32),
        "1d_heatmaps": rng.rand(B, K, vz).astype(np.float32),
        "index": rng.randint(0, vx * vy, (B, K)).astype(np.float32),
        "bbox": rng.rand(B, K, 2).astype(np.float32) * 0.5 + 0.3,
        "mask": np.tile(np.arange(K) < 2, (B, 1)),
        "roots_3d": roots,
        "num_person": np.full((B,), 2, np.int32),
        "joints_3d": (
            roots[:, :, None, :] + rng.uniform(-200, 200, (B, K, J, 3))
        ).astype(np.float32),
        "joints_3d_vis": np.ones((B, K, J), np.float32),
    }


def test_dp_train_step_matches_single_device(setup):
    """Multi-chip training correctness: N steps of the data-parallel train
    step over the 8-virtual-device mesh produce the same parameters as the
    single-device step on the identical global batch (the gradient psum
    XLA inserts must be exactly a global batch mean)."""
    from faster_voxelpose_tpu.engine.trainer import (
        create_train_state,
        make_train_step,
    )
    from faster_voxelpose_tpu.parallel.mesh import make_dp_train_step

    cfg, model, variables, *_ = setup
    batch = _train_batch(cfg, 8, np.random.RandomState(3))

    state_single = create_train_state(cfg, variables)
    step_single = jax.jit(make_train_step(cfg, model))

    mesh = make_mesh(8)
    state_dp = jax.device_put(create_train_state(cfg, variables), replicated(mesh))
    step_dp = make_dp_train_step(cfg, model, mesh)
    batch_dp = shard_batch(batch, mesh, cfg.PARALLEL.MESH_AXIS_NAME)

    for i in range(3):
        state_single, losses_s = step_single(state_single, batch, None)
        state_dp, losses_d = step_dp(state_dp, batch_dp, None)
        assert float(losses_s["total"]) == pytest.approx(
            float(losses_d["total"]), rel=1e-5
        ), f"loss diverged at step {i}"

    flat_s = jax.tree_util.tree_leaves_with_path(state_single.params)
    flat_d = dict(jax.tree_util.tree_leaves_with_path(state_dp.params))
    assert flat_s, "empty param tree"
    for path, leaf_s in flat_s:
        np.testing.assert_allclose(
            np.asarray(leaf_s), np.asarray(flat_d[path]),
            rtol=2e-4, atol=2e-6, err_msg=str(path),
        )


def test_pipelined_stream_matches_serial():
    """Two-stage backbone->fusion pipeline (PipelinedStream) across two
    devices: outputs must equal the serial single-device pipeline, with
    the documented one-frame lag."""
    from faster_voxelpose_tpu.models.resnet import build_backbone
    from faster_voxelpose_tpu.parallel.mesh import PipelinedStream

    cfg = build_our_config()
    cfg.RESNET.NUM_LAYERS = 18  # smallest trunk: this is a plumbing test
    model = build_model(cfg)
    backbone = build_backbone(cfg)

    V = cfg.DATASET.CAMERA_NUM
    iw, ih = cfg.DATASET.IMAGE_SIZE
    rng = np.random.RandomState(7)
    frames = rng.rand(3, V, ih, iw, 3).astype(np.float32)
    cams = _example_cameras(1, V)

    key = jax.random.PRNGKey(0)
    bv = backbone.init(key, np.zeros((1, ih, iw, 3), np.float32))
    hm0 = backbone.apply(bv, frames[0], train=False, mutable=False)
    variables = model.init(key, np.asarray(hm0)[None], cams, train=False)

    # serial reference on the default device
    serial = []
    for t in range(frames.shape[0]):
        hm = backbone.apply(bv, frames[t], train=False, mutable=False)
        out = model.apply(
            variables, hm[None], jnp.asarray(cams), train=False, mutable=False
        )
        serial.append(np.asarray(out.fused_poses[0]))

    stream = PipelinedStream(
        cfg, model, backbone, variables, bv, cams,
        devices=jax.devices()[:2],
    )
    assert stream.push(frames[0]) is None  # nothing in flight yet
    outs = [stream.push(frames[1]), stream.push(frames[2]), stream.flush()]
    assert stream.flush() is None  # drained

    for t, out in enumerate(outs):
        fused, centers = out
        np.testing.assert_allclose(
            fused, serial[t], rtol=1e-5, atol=1e-5,
            err_msg=f"frame {t} diverged through the pipeline",
        )
