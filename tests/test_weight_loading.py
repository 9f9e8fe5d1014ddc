"""Torch-checkpoint loading round trip: torch.save -> load_torch_state_dict
-> convert_model produces a variables tree structurally identical to
model.init's (so released reference checkpoints drop straight into
model.apply)."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path
from tests.test_model_parity import build_our_config, build_ref_config


def test_checkpoint_file_roundtrip_and_tree_structure(tmp_path):
    if not add_reference_to_path():
        pytest.skip("reference not available")
    import torch

    torch.manual_seed(0)
    from models.faster_voxelpose import FasterVoxelPoseNet as RefNet

    ref_model = RefNet(build_ref_config())

    # the reference training checkpoint format (utils/utils.py:89-98)
    path = str(tmp_path / "model_best.pth.tar")
    torch.save({"state_dict": ref_model.state_dict(), "epoch": 7}, path)

    import jax

    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.utils.weights_torch import (
        convert_model,
        load_torch_state_dict,
    )
    from __graft_entry__ import _example_cameras

    sd = load_torch_state_dict(path)
    assert "pose_net.center_net.front_layers.0.block.0.weight" in sd
    converted = convert_model(sd)

    cfg = build_our_config()
    model = build_model(cfg)
    B, V = 1, cfg.DATASET.CAMERA_NUM
    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    hm = np.zeros((B, V, H, W, J), np.float32)
    cams = _example_cameras(B, V)
    init_vars = model.init(jax.random.PRNGKey(0), hm, cams, train=False)

    # identical tree structure and leaf shapes
    init_paths = {
        jax.tree_util.keystr(kp): leaf.shape
        for kp, leaf in jax.tree_util.tree_flatten_with_path(init_vars)[0]
    }
    conv_paths = {
        jax.tree_util.keystr(kp): leaf.shape
        for kp, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    assert init_paths == conv_paths

    # and the converted tree actually applies
    out = model.apply(converted, hm, cams, train=False, mutable=False)
    assert np.isfinite(np.asarray(out.proposal_centers)).all()
