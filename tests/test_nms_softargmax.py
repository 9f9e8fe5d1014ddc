"""Parity of the proposal decode (NMS/top-k) and soft-argmax vs the
reference's torch implementations."""

import numpy as np
import pytest
import jax.numpy as jnp

from faster_voxelpose_tpu.ops.nms import maxpool_nms_2d, nms2d_topk
from faster_voxelpose_tpu.ops.soft_argmax import soft_argmax


def test_nms_matches_reference():
    from tests.conftest import add_reference_to_path

    if not add_reference_to_path():
        pytest.skip("reference not available")
    import torch
    from core.proposal import nms2D

    rng = np.random.RandomState(0)
    B, H, W, K = 3, 80, 80, 10
    prob = rng.rand(B, H, W).astype(np.float32)
    vals, idx, flat = nms2d_topk(jnp.asarray(prob), K)
    ref_vals, ref_idx, ref_flat = nms2D(torch.from_numpy(prob)[:, None], K)
    np.testing.assert_allclose(np.asarray(vals), ref_vals.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(flat), ref_flat.numpy())
    np.testing.assert_array_equal(np.asarray(idx), ref_idx.numpy())


def test_nms_suppresses_plateau_neighbours():
    # equal-valued neighbours both survive (== comparison), matching torch
    x = np.zeros((1, 9, 9), np.float32)
    x[0, 4, 4] = 1.0
    x[0, 4, 5] = 1.0
    out = np.asarray(maxpool_nms_2d(jnp.asarray(x)))
    assert out[0, 4, 4] == 1.0 and out[0, 4, 5] == 1.0
    x[0, 4, 5] = 0.9
    out = np.asarray(maxpool_nms_2d(jnp.asarray(x)))
    assert out[0, 4, 4] == 1.0 and out[0, 4, 5] == 0.0


def test_soft_argmax_matches_reference_math():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    P3, N, J, V = 3, 4, 15, 64
    feats = rng.randn(P3, N, J, V * V).astype(np.float32) * 0.1
    grids = rng.uniform(-1000, 1000, (P3, V * V, 2)).astype(np.float32)
    beta = 100.0

    poses, confs = soft_argmax(jnp.asarray(feats), jnp.asarray(grids), beta)

    # reference SoftArgmaxLayer math (joint_localization_net.py:20-33)
    x = torch.from_numpy(feats).reshape(3, N, J, -1, 1)
    x = F.softmax(beta * x, dim=3)
    ref_confs = torch.mean(torch.max(x, dim=3)[0].squeeze(3), dim=(0, 2))
    g = torch.from_numpy(grids).reshape(3, 1, 1, -1, 2)
    ref_poses = torch.sum(torch.mul(x, g), dim=3)

    np.testing.assert_allclose(np.asarray(poses), ref_poses.numpy(), rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(np.asarray(confs), ref_confs.numpy(), rtol=1e-5, atol=1e-6)


def test_soft_argmax_peak_recovery():
    # a delta at a known bin must decode to that bin's grid coords
    V = 64
    feats = np.zeros((3, 1, 1, V * V), np.float32)
    grids = np.stack(
        [
            np.stack(
                np.meshgrid(np.linspace(-1000, 1000, V), np.linspace(-1000, 1000, V), indexing="ij"),
                axis=-1,
            ).reshape(-1, 2)
        ]
        * 3
    ).astype(np.float32)
    target_bin = 17 * V + 42
    feats[:, 0, 0, target_bin] = 1.0
    poses, confs = soft_argmax(jnp.asarray(feats), jnp.asarray(grids), 100.0)
    np.testing.assert_allclose(np.asarray(poses)[0, 0, 0], grids[0, target_bin], atol=1.0)
