"""Dataset-layer tests: target generation parity vs the reference,
heatmap rendering parity, synthetic scene generation, evaluation metrics
golden checks."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path
from faster_voxelpose_tpu.config import Config
from faster_voxelpose_tpu.datasets.base import PoseDatasetBase, FrameRecord, collate
from faster_voxelpose_tpu.datasets import evaluate as ev


def small_cfg(num_joints=15, root=2, max_people=6):
    cfg = Config()
    cfg.DATASET.ORI_IMAGE_SIZE = (1920, 1080)
    cfg.DATASET.IMAGE_SIZE = (960, 512)
    cfg.DATASET.HEATMAP_SIZE = (240, 128)
    cfg.DATASET.NUM_JOINTS = num_joints
    cfg.DATASET.ROOT_JOINT_ID = root
    cfg.CAPTURE_SPEC.SPACE_SIZE = (8000.0, 8000.0, 2000.0)
    cfg.CAPTURE_SPEC.SPACE_CENTER = (0.0, -500.0, 800.0)
    cfg.CAPTURE_SPEC.VOXELS_PER_AXIS = (80, 80, 20)
    cfg.CAPTURE_SPEC.MAX_PEOPLE = max_people
    cfg.DATASET.__post_init__()
    cfg.CAPTURE_SPEC.__post_init__()
    return cfg


def make_people(rng, n, num_joints=15):
    roots = rng.uniform([-3000, -3500, 600], [3000, 2500, 1100], (n, 3))
    joints = roots[:, None, :] + rng.uniform(-500, 500, (n, num_joints, 3))
    joints[:, 2] = roots  # root joint exactly at the sampled center
    vis = np.ones((n, num_joints))
    return [joints[i] for i in range(n)], [vis[i] for i in range(n)]


class TestTargets:
    def _dataset(self):
        ds = PoseDatasetBase(small_cfg(), is_train=True)
        ds.num_joints = 15
        return ds

    def test_matches_reference(self):
        if not add_reference_to_path():
            pytest.skip("reference not available")
        import torch
        from dataset.JointsDataset import JointsDataset

        cfg = small_cfg()
        ds = self._dataset()
        rng = np.random.RandomState(0)
        joints, vis = make_people(rng, 3)

        ours = ds.generate_target(joints, vis)

        # reference JointsDataset.generate_target without full dataset setup
        ref = JointsDataset.__new__(JointsDataset)
        ref.max_people = cfg.CAPTURE_SPEC.MAX_PEOPLE
        ref.root_id = cfg.DATASET.ROOT_JOINT_ID
        ref.space_size = np.array(cfg.CAPTURE_SPEC.SPACE_SIZE)
        ref.space_center = np.array(cfg.CAPTURE_SPEC.SPACE_CENTER)
        ref.voxels_per_axis = np.array(cfg.CAPTURE_SPEC.VOXELS_PER_AXIS)
        ref.individual_space_size = np.array(cfg.INDIVIDUAL_SPEC.SPACE_SIZE)
        reft = ref.generate_target(joints, vis)

        np.testing.assert_allclose(ours["index"], reft["index"])
        np.testing.assert_allclose(ours["offset"], reft["offset"], atol=1e-9)
        np.testing.assert_allclose(ours["bbox"], reft["bbox"], atol=1e-7)
        np.testing.assert_allclose(ours["2d_heatmaps"], reft["2d_heatmaps"], atol=1e-6)
        np.testing.assert_allclose(ours["1d_heatmaps"], reft["1d_heatmaps"], atol=1e-6)
        np.testing.assert_array_equal(ours["mask"], reft["mask"])

    def test_heatmap_rendering_matches_reference(self):
        if not add_reference_to_path():
            pytest.skip("reference not available")
        from dataset.JointsDataset import JointsDataset

        cfg = small_cfg()
        ds = self._dataset()
        ds.data_augmentation = False
        rng = np.random.RandomState(1)
        n, J = 2, 15
        joints_2d = [rng.uniform([0, 0], [960, 512], (J, 2)) for _ in range(n)]
        vis = [np.ones(J) for _ in range(n)]

        ours = ds.render_heatmap(joints_2d, vis)  # (H, W, J)

        ref = JointsDataset.__new__(JointsDataset)
        ref.heatmap_size = np.array(cfg.DATASET.HEATMAP_SIZE)
        ref.image_size = np.array(cfg.DATASET.IMAGE_SIZE)
        ref.sigma = cfg.NETWORK.SIGMA
        ref.data_augmentation = False
        reft = ref.generate_input_heatmap(
            [j.copy() for j in joints_2d], joints_vis=vis
        )  # (J, H, W)

        np.testing.assert_allclose(ours.transpose(2, 0, 1), reft, atol=1e-6)


class TestMetrics:
    def test_panoptic_ap_matches_reference(self):
        if not add_reference_to_path():
            pytest.skip("reference not available")
        from dataset.panoptic import Panoptic

        rng = np.random.RandomState(2)
        n_frames, J = 12, 15
        all_preds, all_gt, eval_list_frames = [], [], []
        for _ in range(n_frames):
            n_gt = rng.randint(1, 4)
            gts, viss = make_people(rng, n_gt, J)
            gt = np.stack(gts)
            vis = np.stack(viss)
            n_pred = rng.randint(0, 5)
            preds = np.zeros((n_pred, J, 5))
            for p in range(n_pred):
                base = gt[rng.randint(n_gt)] + rng.randn(J, 3) * rng.choice([5, 40, 400])
                preds[p, :, :3] = base
                preds[p, :, 3] = 0.0  # valid
                preds[p, :, 4] = rng.rand()
            all_preds.append(preds)
            all_gt.append((gt, vis))

        eval_list, total_gt = ev.match_predictions(all_preds, all_gt)
        for t in (25, 100, 500):
            ap, rec = ev.ap_at_threshold(eval_list, total_gt, t)
            ref_ap, ref_rec = Panoptic._eval_list_to_ap(list(eval_list), total_gt, t)
            assert ap == pytest.approx(ref_ap, abs=1e-9)
            assert rec == pytest.approx(ref_rec, abs=1e-9)
        assert ev.mpjpe_at_threshold(eval_list) == pytest.approx(
            Panoptic._eval_list_to_mpjpe(list(eval_list)), abs=1e-9
        )
        assert ev.recall_at_threshold(eval_list, total_gt) == pytest.approx(
            Panoptic._eval_list_to_recall(list(eval_list), total_gt), abs=1e-9
        )

    def test_coco_remaps_match_reference(self):
        if not add_reference_to_path():
            pytest.skip("reference not available")
        from dataset.shelf import Shelf
        from dataset.campus import Campus

        rng = np.random.RandomState(3)
        coco = rng.uniform(-1000, 1000, (17, 3))
        np.testing.assert_allclose(
            ev.coco_to_shelf_pose(coco.copy()), Shelf.coco2shelf3D(coco.copy()),
            atol=1e-9,
        )
        np.testing.assert_allclose(
            ev.coco_to_campus_pose(coco.copy()), Campus.coco2campus3D(coco.copy()),
            atol=1e-9,
        )

    def test_pcp_perfect_predictions(self):
        # perfect COCO predictions whose remap equals GT -> PCP == 1
        rng = np.random.RandomState(4)
        frames, actor_gt, all_preds = 5, [], []
        for _ in range(frames):
            coco = rng.uniform(-1000, 1000, (2, 17, 3))
            gts = [ev.coco_to_shelf_pose(c) for c in coco]
            actor_gt.append(gts)
            preds = np.zeros((2, 17, 5))
            preds[:, :, :3] = coco
            preds[:, :, 3] = 0.0
            all_preds.append(preds)
        pcp, msg, detail = ev.pcp3d_metrics(all_preds, actor_gt, ev.coco_to_shelf_pose)
        assert pcp == pytest.approx(1.0)
        assert detail["recall"] == pytest.approx(1.0)


class TestSynthetic:
    def test_scene_generation(self):
        from faster_voxelpose_tpu.datasets.synthetic import SyntheticDataset
        from tests.test_geometry import make_camera

        cfg = small_cfg(num_joints=15, root=2, max_people=6)
        cfg.DATASET.CAMERA_NUM = 3
        cfg.SYNTHETIC.MAX_PEOPLE = 4
        cfg.SYNTHETIC.NUM_DATA = 5
        cfg.SYNTHETIC.DATA_AUGMENTATION = False

        rng = np.random.RandomState(5)
        bank = []
        for _ in range(20):
            joints, vis = make_people(rng, 1, 15)
            bank.append({"pose": joints[0], "vis": np.ones((15, 4))})
        cams = {i: make_camera(i) for i in range(3)}
        for c in cams.values():
            c["fx"], c["fy"], c["cx"], c["cy"] = 1100.0, 1100.0, 960.0, 540.0

        ds = SyntheticDataset(cfg, pose_bank=bank, cameras=cams, seed=5)
        assert len(ds) == 5
        sample = ds[0]
        V, (W, Hh) = cfg.DATASET.CAMERA_NUM, cfg.DATASET.HEATMAP_SIZE
        assert sample["input_heatmaps"].shape == (V, Hh, W, 15)
        assert sample["2d_heatmaps"].shape == (80, 80)
        assert sample["cameras"].shape == (V, 21)
        assert 0 < sample["num_person"] <= 4
        # all placed people inside the capture space
        n = int(sample["num_person"])
        roots = sample["roots_3d"][:n]
        assert (np.abs(roots[:, 0] - 0.0) <= 4000).all()
        assert (np.abs(roots[:, 1] + 500.0) <= 4000).all()
        batch = collate([ds[0], ds[1]])
        assert batch["input_heatmaps"].shape[0] == 2
