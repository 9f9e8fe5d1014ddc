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
