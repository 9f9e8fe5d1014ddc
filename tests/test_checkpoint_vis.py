"""Checkpoint round-trip (orbax) and visualization smoke tests."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from faster_voxelpose_tpu.engine.checkpoint import (
    load_best_model,
    load_checkpoint,
    save_checkpoint,
)
from faster_voxelpose_tpu.engine.trainer import TrainState


def make_state(seed=0):
    rng = np.random.RandomState(seed)
    params = {
        "hdn": {"w": jnp.asarray(rng.randn(4, 4), jnp.float32)},
        "jln": {"w": jnp.asarray(rng.randn(3, 3), jnp.float32)},
    }
    return TrainState(
        params=params,
        batch_stats={"hdn": {"bn": {"mean": jnp.zeros(4)}}},
        opt_state_pose={"count": jnp.zeros((), jnp.int32)},
        opt_state_joint={"mu": jnp.ones(3)},
        step=jnp.asarray(7, jnp.int32),
    )


def test_checkpoint_roundtrip(tmp_path):
    out = str(tmp_path)
    state = make_state(0)
    eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
    save_checkpoint(out, state, epoch=3, best_metric=0.9, is_best=True,
                    model_variables=eval_vars)

    blank = make_state(99)
    restored, epoch, best = load_checkpoint(out, blank)
    assert epoch == 3 and best == pytest.approx(0.9)
    np.testing.assert_allclose(
        restored.params["hdn"]["w"], state.params["hdn"]["w"]
    )
    np.testing.assert_allclose(
        restored.opt_state_joint["mu"], state.opt_state_joint["mu"]
    )
    assert int(restored.step) == 7

    best_vars = load_best_model(out, eval_vars)
    np.testing.assert_allclose(
        best_vars["params"]["jln"]["w"], state.params["jln"]["w"]
    )


def test_checkpoint_missing_starts_fresh(tmp_path):
    state = make_state(1)
    restored, epoch, best = load_checkpoint(str(tmp_path / "nope"), state)
    assert epoch == 0 and np.isneginf(best)


class TestVis:
    def _poses(self):
        rng = np.random.RandomState(0)
        poses = np.zeros((4, 15, 5), np.float32)
        poses[:, :, :3] = rng.uniform(-1500, 1500, (4, 15, 3))
        poses[:2, :, 3] = 0.0  # two valid
        poses[2:, :, 3] = -1.0
        poses[:, :, 4] = rng.rand(4, 15)
        return poses

    def test_save_2d_planes(self, tmp_path):
        from faster_voxelpose_tpu.config import Config
        from faster_voxelpose_tpu.utils.vis import save_2d_planes

        cfg = Config()
        centers = np.zeros((4, 7), np.float32)
        centers[:2, 3] = 0
        centers[2:, 3] = -1
        centers[:2, 5:7] = 0.5
        path = save_2d_planes(cfg, self._poses(), centers, str(tmp_path / "t"))
        assert os.path.exists(path)

    def test_save_heatmaps(self, tmp_path):
        from faster_voxelpose_tpu.utils.vis import save_heatmaps

        hm = np.random.RandomState(0).rand(2, 32, 60, 5).astype(np.float32)
        paths = save_heatmaps(hm, str(tmp_path / "h"))
        assert len(paths) == 2 and all(os.path.exists(p) for p in paths)

    def test_save_image_with_poses(self, tmp_path):
        pytest.importorskip("cv2")
        from faster_voxelpose_tpu.utils.vis import save_image_with_poses
        from faster_voxelpose_tpu.config import Config
        from tests.test_geometry import make_camera
        from faster_voxelpose_tpu.geometry.cameras import pack_rig

        cfg = Config()
        rig = pack_rig([make_camera(0), make_camera(1)])
        imgs = [np.zeros((240, 320, 3), np.uint8)] * 2
        paths = save_image_with_poses(cfg, imgs, self._poses(), rig, str(tmp_path / "v"))
        assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
