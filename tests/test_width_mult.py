"""NETWORK.WIDTH_MULT: the weight-deviating narrow-trunk experiment knob.

width=1.0 must reproduce the reference topology exactly (checkpoint
converter compatibility); width=0.5 must shrink every U-Net trunk while
keeping the model's input/output contract intact.
"""

import jax
import numpy as np

from faster_voxelpose_tpu.models.blocks import scaled


def _tiny_cfg():
    import __graft_entry__ as ge

    return ge._tiny_config()


def _param_count(variables):
    return sum(
        int(np.prod(np.shape(x)))
        for x in jax.tree_util.tree_leaves(variables["params"])
    )


def test_scaled_rounding():
    assert scaled(32, 1.0) == 32
    assert scaled(32, 0.5) == 16
    assert scaled(128, 0.5) == 64
    assert scaled(16, 0.25) == 8  # floor at 8
    assert scaled(12, 0.5) == 8  # rounds to multiple of 8
    assert scaled(64, 1.5) == 96


def test_width_mult_shrinks_and_runs():
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    import __graft_entry__ as ge

    cfg = _tiny_cfg()
    B, V = 1, cfg.DATASET.CAMERA_NUM
    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    hm = np.random.RandomState(0).rand(B, V, H, W, J).astype(np.float32)
    cams = ge._example_cameras(B, V)

    model_full = build_model(cfg)
    vars_full = model_full.init(jax.random.PRNGKey(0), hm, cams, train=False)

    cfg.NETWORK.WIDTH_MULT = 0.5
    model_half = build_model(cfg)
    vars_half = model_half.init(jax.random.PRNGKey(0), hm, cams, train=False)

    n_full, n_half = _param_count(vars_full), _param_count(vars_half)
    assert n_half < 0.5 * n_full, (n_full, n_half)

    out = model_half.apply(vars_half, hm, cams, train=False, mutable=False)
    assert out.fused_poses.shape == (
        B, cfg.CAPTURE_SPEC.MAX_PEOPLE, J, 5,
    )
    assert np.all(np.isfinite(np.asarray(out.fused_poses)))


def test_width_one_structure_unchanged():
    """width=1.0 must not rename or reshape any parameter (converter and
    existing checkpoints depend on the exact tree)."""
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    import __graft_entry__ as ge

    cfg = _tiny_cfg()
    assert cfg.NETWORK.WIDTH_MULT == 1.0
    B, V = 1, cfg.DATASET.CAMERA_NUM
    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    hm = np.zeros((B, V, H, W, J), np.float32)
    cams = ge._example_cameras(B, V)
    variables = build_model(cfg).init(jax.random.PRNGKey(0), hm, cams, train=False)
    paths = {
        "/".join(str(getattr(k, "key", k)) for k in path): np.shape(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables["params"]
        )[0]
    }
    # spot-check the reference channel plan survives
    assert any("encdec" in p and s[-1] == 128 for p, s in paths.items()), paths
