"""Round-2 gap closures, golden-tested:

* PCP3D golden parity against the reference evaluators
  (/root/reference/lib/dataset/shelf.py:162-227, campus.py:138-209) on
  noisy random predictions — per-actor accounting, head-torso pseudo-limb,
  recall@500 all exercised.
* Image-source training end-to-end: JPEG fixtures -> dataset ->
  DataLoader -> backbone -> one train step (reference function.py:39-47).
* Multi-host input sharding: per-process strided record partitioning is
  disjoint and complete.
"""

import os

import numpy as np
import pytest

from tests.conftest import add_reference_to_path
from tests.test_shelf_campus_loader import write_fixtures


# ---------------------------------------------------------------------------
# PCP3D golden parity
# ---------------------------------------------------------------------------


def _noisy_preds(truth, frames, num_actors, seed=7):
    """COCO-order predictions around GT with per-actor noise levels chosen
    so some limbs pass the alpha=0.5 criterion and some fail, plus one
    garbage extra detection per frame and one invalid slot."""
    rng = np.random.RandomState(seed)
    K, J = 4, 17
    preds = np.zeros((len(frames), K, J, 5), np.float32)
    preds[:, :, :, 3] = -1.0  # invalid by default
    for i, fi in enumerate(frames):
        for a in range(num_actors):
            noise = rng.uniform(0, 120 * (a + 1), (J, 3)) * rng.choice(
                [-1, 1], (J, 3)
            )
            preds[i, a, :, :3] = truth[(a, fi)] * 1000.0 + noise
            preds[i, a, :, 3] = 0.0
            preds[i, a, :, 4] = rng.rand()
        # a spurious far-away detection (still valid flag)
        preds[i, num_actors, :, :3] = rng.uniform(3000, 9000, (J, 3))
        preds[i, num_actors, :, 3] = 0.0
    return preds


@pytest.fixture(scope="module")
def pcp_setup(tmp_path_factory):
    if not add_reference_to_path():
        pytest.skip("reference not available")
    root = str(tmp_path_factory.mktemp("pcp_golden"))
    frames = list(range(300, 330))
    truth = write_fixtures(root, frames, num_views=3, num_actors=3, seed=3)
    preds = _noisy_preds(truth, frames, num_actors=3)
    return root, frames, truth, preds


def _load_actor_gt_mm(root, frames):
    from faster_voxelpose_tpu.datasets.shelf_campus import load_actors_gt

    actor_3d = load_actors_gt(os.path.join(root, "actorsGT.mat"))
    return [
        [np.asarray(actor[fi] * 1000.0) for actor in actor_3d] for fi in frames
    ]


def _run_reference_eval(cls, root, frames, preds):
    import torch

    ref = cls.__new__(cls)
    ref.dataset_dir = root
    ref.frame_range = frames
    return cls.evaluate(ref, torch.from_numpy(preds))


def test_pcp3d_golden_vs_reference_shelf(pcp_setup):
    root, frames, truth, preds = pcp_setup
    from dataset.shelf import Shelf as RefShelf

    ref_metric, ref_msg = _run_reference_eval(RefShelf, root, frames, preds)

    from faster_voxelpose_tpu.datasets import evaluate as ev

    actor_gt = _load_actor_gt_mm(root, frames)
    metric, msg, extra = ev.pcp3d_metrics(list(preds), actor_gt, ev.coco_to_shelf_pose)

    assert metric == pytest.approx(ref_metric, abs=1e-12), (msg, ref_msg)
    # the noisy predictions must actually produce a non-trivial PCP
    assert 0.05 < metric < 0.999, msg
    ref_recall = float(ref_msg.rsplit(":", 1)[1])
    assert extra["recall"] == pytest.approx(ref_recall, abs=5e-5)


def test_pcp3d_golden_vs_reference_campus(pcp_setup):
    root, frames, truth, preds = pcp_setup
    from dataset.campus import Campus as RefCampus

    ref_metric, ref_msg = _run_reference_eval(RefCampus, root, frames, preds)

    from faster_voxelpose_tpu.datasets import evaluate as ev

    actor_gt = _load_actor_gt_mm(root, frames)
    metric, msg, extra = ev.pcp3d_metrics(
        list(preds), actor_gt, ev.coco_to_campus_pose
    )
    assert metric == pytest.approx(ref_metric, abs=1e-12), (msg, ref_msg)
    assert 0.05 < metric < 0.999, msg


# ---------------------------------------------------------------------------
# image-source training end-to-end
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def image_train_setup(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    from tests.test_model_parity import build_our_config
    from tests.test_geometry import make_camera

    cfg = build_our_config()
    cfg.DATASET.CAMERA_NUM = 2
    cfg.DATASET.TRAIN_HEATMAP_SRC = "image"
    cfg.RESNET.NUM_LAYERS = 18
    cfg.TRAIN.BATCH_SIZE = 1

    root = str(tmp_path_factory.mktemp("jpegs"))
    rng = np.random.RandomState(0)
    W0, H0 = cfg.DATASET.ORI_IMAGE_SIZE
    paths = []
    for v in range(cfg.DATASET.CAMERA_NUM):
        p = os.path.join(root, f"view{v}.jpg")
        cv2.imwrite(p, rng.randint(0, 255, (H0, W0, 3), np.uint8))
        paths.append(p)
    return cfg, paths


def _make_image_dataset(cfg, paths):
    from faster_voxelpose_tpu.datasets.base import FrameRecord, PoseDatasetBase
    from tests.test_geometry import make_camera

    ds = PoseDatasetBase(cfg, is_train=True)
    ds.cameras = {"seq": [make_camera(v) for v in range(cfg.DATASET.CAMERA_NUM)]}
    rng = np.random.RandomState(1)
    joints = rng.uniform(-800, 800, (2, cfg.DATASET.NUM_JOINTS, 3)) + np.array(
        [0.0, 0.0, 900.0]
    )
    ds.records = [
        FrameRecord(
            seq="seq",
            joints_3d=joints.astype(np.float32),
            joints_3d_vis=np.ones((2, cfg.DATASET.NUM_JOINTS), np.float32),
            image_paths=paths,
        )
    ]
    return ds


def test_image_source_sample_has_images(image_train_setup):
    cfg, paths = image_train_setup
    ds = _make_image_dataset(cfg, paths)
    sample = ds[0]
    W, H = cfg.DATASET.IMAGE_SIZE
    assert "input_heatmaps" not in sample
    assert sample["images"].shape == (cfg.DATASET.CAMERA_NUM, H, W, 3)
    # frames ship uint8 (4x smaller); the train/eval step normalizes
    # on device (datasets/images.py:normalize_images_device)
    assert sample["images"].dtype == np.uint8


def test_image_source_train_step(image_train_setup):
    """JPEG fixtures -> loader batch with 'images' -> backbone -> model ->
    one optimizer step with finite losses (the path the reference trains
    Panoptic with, function.py:39-47; was a KeyError before round 2)."""
    import jax

    from faster_voxelpose_tpu.engine.loader import DataLoader
    from faster_voxelpose_tpu.engine.trainer import create_train_state, make_train_step
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.models.resnet import build_backbone

    cfg, paths = image_train_setup
    ds = _make_image_dataset(cfg, paths)
    loader = DataLoader(ds, batch_size=1, shuffle=False)
    batch = next(iter(loader))
    assert "images" in batch and "input_heatmaps" not in batch
    batch.pop("_valid", None)
    batch.pop("offset", None)

    model = build_model(cfg)
    backbone = build_backbone(cfg)
    rng = jax.random.PRNGKey(0)
    iw, ih = cfg.DATASET.IMAGE_SIZE
    backbone_vars = backbone.init(rng, np.zeros((1, ih, iw, 3), np.float32))

    W, H = cfg.DATASET.HEATMAP_SIZE
    dummy_hm = np.zeros(
        (1, cfg.DATASET.CAMERA_NUM, H, W, cfg.DATASET.NUM_JOINTS), np.float32
    )
    dummy_cam = batch["cameras"][:1]
    variables = model.init(rng, dummy_hm, dummy_cam, train=False)

    state = create_train_state(cfg, variables)
    step = jax.jit(make_train_step(cfg, model, backbone))
    state, losses = step(state, batch, backbone_vars)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    assert int(state.step) == 1


# ---------------------------------------------------------------------------
# multi-host input sharding
# ---------------------------------------------------------------------------


class _IdxDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.asarray([i], np.int64)}


def test_multihost_loader_partitions_disjointly():
    """Simulated 2-host pod: the two per-process loaders see disjoint
    records and EQUAL record counts (n // process_count each — a host
    with one extra batch would run one extra collective step and
    deadlock SPMD training), every epoch, including under shuffling
    (both hosts draw the same seeded permutation).  The < process_count
    remainder records rotate across shuffled epochs."""
    from faster_voxelpose_tpu.engine.loader import DataLoader

    n = 23
    loaders = [
        DataLoader(
            _IdxDataset(n), batch_size=4, shuffle=True, seed=11,
            process_count=2, process_index=p,
        )
        for p in range(2)
    ]
    for epoch in range(2):
        seen = [set(), set()]
        for p, loader in enumerate(loaders):
            for batch in loader:
                seen[p].update(batch["idx"][batch["_valid"]].ravel().tolist())
        assert seen[0].isdisjoint(seen[1]), "hosts overlap"
        assert len(seen[0]) == len(seen[1]) == n // 2, "unequal host shares"
        assert (seen[0] | seen[1]) <= set(range(n))


def test_multihost_loader_equal_batch_counts():
    """Every host yields the SAME number of batches for any (n, pc, bs),
    drop_last or not — the round-2 advisor's pod-deadlock finding (e.g.
    n=103, pc=2, bs=4 used to give 13 vs 12 batches)."""
    from faster_voxelpose_tpu.engine.loader import DataLoader

    for n, pc, bs in [(103, 2, 4), (23, 2, 4), (17, 4, 4), (64, 3, 8)]:
        for drop_last in (False, True):
            counts = []
            for p in range(pc):
                ld = DataLoader(
                    _IdxDataset(n), batch_size=bs, drop_last=drop_last,
                    process_count=pc, process_index=p,
                )
                batches = list(ld)
                assert len(batches) == len(ld)
                counts.append(len(batches))
            assert len(set(counts)) == 1, (n, pc, bs, drop_last, counts)


def test_multihost_loader_len_and_drop_last():
    from faster_voxelpose_tpu.engine.loader import DataLoader

    n = 23
    for p in range(2):
        ld = DataLoader(
            _IdxDataset(n), batch_size=4, drop_last=True,
            process_count=2, process_index=p,
        )
        batches = list(ld)
        assert len(batches) == len(ld)
        for b in batches:
            assert b["idx"].shape[0] == 4


def test_partition_params_rejects_uncovered_subtree():
    from faster_voxelpose_tpu.engine.trainer import partition_params

    import jax.numpy as jnp

    params = {"hdn": {"w": jnp.zeros(2)}, "jln": {"w": jnp.zeros(2)}}
    pose, joint = partition_params(params)
    assert set(pose) == {"hdn"} and set(joint) == {"jln"}

    params["backbone"] = {"w": jnp.zeros(2)}
    with pytest.raises(ValueError, match="backbone"):
        partition_params(params)
