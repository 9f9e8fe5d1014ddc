"""Native C++ renderer: build + exact parity with the numpy rasterizer and
the end-to-end Python heatmap path."""

import numpy as np
import pytest

from faster_voxelpose_tpu.native.build import (
    load_render_lib,
    native_available,
    render_joints_native,
)
from faster_voxelpose_tpu.datasets.base import _render_joints_numpy


@pytest.fixture(scope="module")
def lib():
    if load_render_lib() is None:
        pytest.skip("no C++ toolchain")
    return True


def make_instances(rng, M, H, W, J):
    mu = np.stack(
        [rng.randint(-10, W + 10, M), rng.randint(-10, H + 10, M)], axis=1
    ).astype(np.int32)
    joint_id = rng.randint(0, J, M).astype(np.int32)
    sigmas = rng.uniform(1.0, 6.0, M).astype(np.float32)
    tmps = (sigmas * 3).astype(np.float32)
    scales = rng.uniform(0.2, 1.3, M).astype(np.float32)
    occls = np.zeros((M, 4), np.int32)
    for m in range(M):
        if rng.rand() < 0.5:
            y0, x0 = rng.randint(0, H), rng.randint(0, W)
            occls[m] = (y0, y0 + rng.randint(0, H), x0, x0 + rng.randint(0, W))
    return mu, joint_id, sigmas, tmps, scales, occls


def test_native_matches_numpy(lib):
    rng = np.random.RandomState(0)
    H, W, J, M = 64, 96, 7, 50
    args = make_instances(rng, M, H, W, J)
    ours = render_joints_native(H, W, J, *args)
    ref = _render_joints_numpy(H, W, J, *args)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_native_empty(lib):
    out = render_joints_native(
        8, 8, 2,
        np.zeros((0, 2), np.int32), np.zeros(0, np.int32),
        np.zeros(0, np.float32), np.zeros(0, np.float32),
        np.zeros(0, np.float32), np.zeros((0, 4), np.int32),
    )
    assert out.shape == (8, 8, 2) and not out.any()


def test_render_heatmap_uses_native_consistently():
    """End-to-end dataset path gives the same result whether the native
    kernel resolves or the numpy fallback runs."""
    from faster_voxelpose_tpu.datasets.base import PoseDatasetBase
    from tests.test_datasets import small_cfg

    cfg = small_cfg()
    ds = PoseDatasetBase(small_cfg(), is_train=True)
    ds.num_joints = 15
    ds.data_augmentation = False
    rng = np.random.RandomState(1)
    joints_2d = [rng.uniform([0, 0], [960, 512], (15, 2)) for _ in range(3)]
    vis = [np.ones(15) for _ in range(3)]
    out = ds.render_heatmap(joints_2d, vis)
    assert out.shape == (128, 240, 15)
    assert out.max() <= 1.0 and out.min() >= 0.0 and out.max() > 0.5
