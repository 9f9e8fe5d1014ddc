"""Golden parity tests for the geometry layer against the PyTorch reference
(used as a read-only numerical oracle) and cv2."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path
from faster_voxelpose_tpu.geometry import cameras as cam
from faster_voxelpose_tpu.geometry import transforms as tf
from faster_voxelpose_tpu.geometry import grids


def make_camera(seed=0):
    rng = np.random.RandomState(seed)
    # a plausible rig: camera ~4m away looking at the origin, mild distortion
    angle = rng.uniform(0, 2 * np.pi)
    Rz = np.array(
        [
            [np.cos(angle), -np.sin(angle), 0],
            [np.sin(angle), np.cos(angle), 0],
            [0, 0, 1],
        ]
    )
    tilt = rng.uniform(0.2, 0.7)
    Rx = np.array(
        [
            [1, 0, 0],
            [0, np.cos(tilt), -np.sin(tilt)],
            [0, np.sin(tilt), np.cos(tilt)],
        ]
    )
    R = Rx @ Rz
    T = (-R.T @ np.array([[0.0], [0.0], [4000.0]])) + rng.randn(3, 1) * 100
    return {
        "R": R,
        "T": T,
        "fx": 1100.0 + rng.randn() * 50,
        "fy": 1100.0 + rng.randn() * 50,
        "cx": 960.0,
        "cy": 540.0,
        "k": rng.randn(3, 1) * np.array([[0.02], [0.005], [0.0005]]),
        "p": rng.randn(2, 1) * 0.005,
    }


class TestCameraProjection:
    def test_np_matches_reference_cpu(self):
        if not add_reference_to_path():
            pytest.skip("reference not available")
        from utils.cameras import project_pose_cpu  # reference oracle

        camera = make_camera(1)
        pts = np.random.RandomState(2).uniform(-2000, 2000, (500, 3))
        ours = cam.project_points_np(pts, cam.pack_camera(camera))
        ref = project_pose_cpu(pts, camera)
        np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-8)

    def test_jnp_matches_reference_f32(self):
        """Device path (f32) vs the reference's torch f32 GPU-path math —
        same precision, so agreement must be tight."""
        if not add_reference_to_path():
            pytest.skip("reference not available")
        import torch
        import jax.numpy as jnp
        from utils.cameras import project_pose  # reference torch oracle

        camera = make_camera(3)
        packed = cam.pack_camera(camera)
        rng = np.random.RandomState(4)
        # points inside the capture volume, in front of the camera
        pts = rng.uniform([-1500, -1500, 0], [1500, 1500, 2000], (257, 3))
        ours = np.asarray(
            cam.project_points(
                jnp.asarray(pts, jnp.float32), jnp.asarray(packed, jnp.float32)
            )
        )
        ref = project_pose(torch.from_numpy(pts).float(), camera).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-2)

    def test_np_matches_jnp_loose(self):
        """Host f64 vs device f32 stay within a fraction of a pixel for
        in-volume points with realistic distortion."""
        import jax.numpy as jnp

        camera = make_camera(7)
        camera["k"] = np.array([[0.02], [0.002], [0.0]])
        camera["p"] = np.array([[0.001], [-0.001]])
        packed = cam.pack_camera(camera)
        pts = np.random.RandomState(8).uniform(
            [-1500, -1500, 0], [1500, 1500, 2000], (257, 3)
        )
        ours_np = cam.project_points_np(pts, packed)
        ours_jnp = np.asarray(
            cam.project_points(
                jnp.asarray(pts, jnp.float32), jnp.asarray(packed, jnp.float32)
            )
        )
        np.testing.assert_allclose(ours_jnp, ours_np, rtol=1e-3, atol=1.0)

    def test_pack_unpack_roundtrip(self):
        camera = make_camera(5)
        up = cam.unpack_camera(cam.pack_camera(camera))
        np.testing.assert_allclose(up["R"], camera["R"])
        np.testing.assert_allclose(up["T"], camera["T"])
        assert up["fx"] == camera["fx"]
        np.testing.assert_allclose(up["k"], camera["k"])


class TestAffine:
    def test_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        for seed, (ow, oh), (iw, ih) in [
            (0, (1920, 1080), (960, 512)),
            (1, (1032, 776), (800, 608)),
            (2, (360, 288), (800, 640)),
        ]:
            c = np.array([ow / 2.0, oh / 2.0])
            s = tf.get_scale((ow, oh), (iw, ih))
            ours = tf.get_affine_transform(c, s, 0, (iw, ih))
            scale_tmp = np.asarray(s) * 200.0
            # replicate via cv2 from the same three src/dst points
            if not add_reference_to_path():
                pytest.skip("reference not available")
            from utils.transforms import get_affine_transform as ref_gat

            ref = ref_gat(c, s, 0, (iw, ih))
            np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-8)

    def test_point_roundtrip(self):
        c = np.array([960.0, 540.0])
        s = tf.get_scale((1920, 1080), (960, 512))
        t = tf.get_affine_transform(c, s, 0, (960, 512))
        t_inv = tf.get_affine_transform(c, s, 0, (960, 512), inv=True)
        pt = np.array([123.4, 567.8])
        back = tf.affine_transform(tf.affine_transform(pt, t), t_inv)
        np.testing.assert_allclose(back, pt, atol=1e-6)

    def test_points_batch_matches_scalar(self):
        t = tf.get_resize_transform((1920, 1080), (960, 512))
        pts = np.random.RandomState(0).uniform(0, 1920, (50, 2))
        batch = tf.affine_transform_points(pts, t)
        single = np.stack([tf.affine_transform(p, t) for p in pts])
        np.testing.assert_allclose(batch, single, atol=1e-9)

    def test_rotate_points_matches_reference(self):
        if not add_reference_to_path():
            pytest.skip("reference not available")
        from utils.transforms import rotate_points as ref_rot

        pts = np.random.RandomState(1).uniform(-1000, 1000, (15, 2))
        center = np.array([100.0, -50.0])
        np.testing.assert_allclose(
            tf.rotate_points(pts, center, 37.5),
            ref_rot(pts, center.reshape(2, 1), 37.5),
            atol=1e-9,
        )


class TestGrids:
    def test_grid_matches_reference_torch(self):
        if not add_reference_to_path():
            pytest.skip("reference not available")
        import torch

        # reference compute_grid (project_whole.py:28-47), inline oracle
        def ref_grid(box_size, box_center, n_bins):
            g1x = torch.linspace(-box_size[0] / 2, box_size[0] / 2, n_bins[0])
            g1y = torch.linspace(-box_size[1] / 2, box_size[1] / 2, n_bins[1])
            g1z = torch.linspace(-box_size[2] / 2, box_size[2] / 2, n_bins[2])
            gx, gy, gz = torch.meshgrid(
                g1x + box_center[0], g1y + box_center[1], g1z + box_center[2],
                indexing="ij",
            )
            return torch.stack(
                [gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], dim=1
            ).numpy()

        size, center, bins = (8000.0, 8000.0, 2000.0), (0.0, -500.0, 800.0), (8, 10, 4)
        np.testing.assert_allclose(
            grids.compute_grid_np(size, center, bins),
            ref_grid(size, center, bins),
            rtol=1e-5,
            atol=1e-2,
        )

    def test_center_grids_shape_and_content(self):
        cg = compute = grids.compute_center_grids_np(
            (2000.0, 2000.0, 2000.0), (0.0, -500.0, 800.0), (64, 64, 64)
        )
        assert cg.shape == (3, 64 * 64, 2)
        # xy plane: x varies slowly (row-major), y fast
        assert np.allclose(cg[0, 0], [-1000.0, -1500.0])
        assert np.allclose(cg[0, 63], [-1000.0, 500.0])  # y max at row 0
        # xz plane first coord is x, second is z
        assert np.allclose(cg[1, 0], [-1000.0, -200.0])
        # yz plane: (y, z)
        assert np.allclose(cg[2, -1], [500.0, 1800.0])
