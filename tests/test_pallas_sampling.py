"""Pallas sampling kernel: semantics tests in the Pallas interpreter
(CPU).  On-chip parity + throughput are exercised by
scripts/check_pallas_parity.py and scripts/probe_pallas.py (the real
Mosaic lowering was additionally bit-checked there: max err 2.4e-7 exact
mode at the full Panoptic profile)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faster_voxelpose_tpu.ops.pallas_sampling import (
    SampleKernelSpec,
    pack_heatmaps,
    sample_tiles,
    tile_offsets_np,
    tiles_to_cube,
)


def test_tile_order_roundtrip():
    voxels, tile = (8, 8, 8), (4, 4, 2)
    offs = tile_offsets_np(voxels, tile)
    n = 8 * 8 * 8
    assert offs.shape == (n, 3)
    # enumerates every voxel exactly once
    flat = offs[:, 0] * 64 + offs[:, 1] * 8 + offs[:, 2]
    assert len(np.unique(flat)) == n

    # values written in tile order land at their cube positions
    jp, s = 16, 4 * 4 * 2
    vals = np.zeros((n // s, jp, s), np.float32)
    ref = np.arange(n, dtype=np.float32)
    for b in range(n // s):
        for i in range(s):
            o = offs[b * s + i]
            vals[b, 3, i] = o[0] * 64 + o[1] * 8 + o[2]
    cube = np.asarray(tiles_to_cube(jnp.asarray(vals), voxels, tile, 15))
    expect = ref.reshape(8, 8, 8)
    np.testing.assert_array_equal(cube[..., 3], expect)
    assert cube.shape == (8, 8, 8, 15)


def _spec(**kw):
    base = dict(
        n_views=2, height=32, width=40, num_joints=5,
        tile=(4, 4, 8), window_x=24, window_y=32,
        exact=True, interpret=True,
    )
    base.update(kw)
    return SampleKernelSpec(**base)


def _xla_reference(hm, coords, spec):
    """hm (V,H,W,J); coords (NB,V,2,S) pixels -> (NB,JP,S)."""
    from faster_voxelpose_tpu.ops.sampling import bilinear_sample

    W, H, J = spec.width, spec.height, spec.num_joints
    x, y = coords[:, :, 0, :], coords[:, :, 1, :]
    c = jnp.stack([x / (W - 1) * 2 - 1, y / (H - 1) * 2 - 1], axis=-1)
    vals = jax.vmap(lambda cv: jax.vmap(bilinear_sample, (0, 0))(hm, cv))(c)
    out = jnp.clip(jnp.mean(vals, axis=1), 0.0, 1.0)
    out = jnp.pad(out, ((0, 0), (0, 0), (0, spec.jp - J)))
    return out.transpose(0, 2, 1)


def test_kernel_matches_bilinear_reference():
    """Interpreter-mode kernel vs the (torch-bit-validated) XLA bilinear,
    including out-of-image coords and image-edge windows."""
    spec = _spec()
    rng = np.random.RandomState(0)
    hm = rng.rand(spec.n_views, spec.height, spec.width, spec.num_joints)
    hm = hm.astype(np.float32)

    nb, s = 6, spec.samples
    centers = np.stack(
        [
            rng.uniform(-6, spec.width + 6, (nb, spec.n_views, 1)),
            rng.uniform(-6, spec.height + 6, (nb, spec.n_views, 1)),
        ],
        axis=2,
    )
    jitter = rng.uniform(-5, 5, (nb, spec.n_views, 2, s))
    coords = (centers + jitter).astype(np.float32)

    hm_packed = pack_heatmaps(jnp.asarray(hm), spec)
    ours = np.asarray(sample_tiles(hm_packed, jnp.asarray(coords), spec))
    ref = np.asarray(_xla_reference(jnp.asarray(hm), jnp.asarray(coords), spec))
    np.testing.assert_allclose(ours, ref, atol=5e-6)


def test_individual_projection_pallas_matches_quad():
    """Full per-person crop path: pallas variant == quad variant at the
    tiny profile (same world->pixel math, same bbox mask, same maxes)."""
    from tests.test_model_parity import build_our_config
    from __graft_entry__ import _example_cameras
    from faster_voxelpose_tpu.models.projection import (
        compute_crop_origin,
        make_projection_geometry,
        project_individual_planes,
        project_individual_planes_pallas,
    )
    from faster_voxelpose_tpu.ops.sampling import build_quad_table

    cfg = build_our_config()
    geom = make_projection_geometry(cfg)
    V = cfg.DATASET.CAMERA_NUM
    J = cfg.DATASET.NUM_JOINTS
    W, H = cfg.DATASET.HEATMAP_SIZE

    spec = SampleKernelSpec(
        n_views=V, height=H, width=W, num_joints=J,
        tile=(8, 8, 8), window_x=24, window_y=32,
        exact=True, interpret=True,
    )

    rng = np.random.RandomState(1)
    hm = rng.rand(V, H, W, J).astype(np.float32)
    cams = _example_cameras(1, V)[0]

    K = 3
    centers = rng.uniform(-1000, 1000, (K, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(600, 1000, K)
    tl, _ = compute_crop_origin(geom, jnp.asarray(centers))
    bbox = rng.uniform(0.3, 0.9, (K, 2)).astype(np.float32)
    valid = jnp.asarray([True, True, False])

    quads = build_quad_table(jnp.asarray(hm[0]))
    quads = jax.vmap(build_quad_table)(jnp.asarray(hm))
    ref = project_individual_planes(geom, quads, cams, tl, bbox, valid)

    hm_packed = pack_heatmaps(jnp.asarray(hm), spec)
    ours = project_individual_planes_pallas(
        geom, hm_packed, cams, tl, bbox, valid, spec
    )
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_resolve_sampling_spec_auto_cpu_is_quad():
    from tests.test_model_parity import build_our_config
    from faster_voxelpose_tpu.models.faster_voxelpose import (
        resolve_sampling_spec,
    )

    cfg = build_our_config()
    assert cfg.NETWORK.SAMPLING_BACKEND == "auto"
    assert resolve_sampling_spec(cfg) is None  # tests run on CPU

    cfg.NETWORK.SAMPLING_BACKEND = "pallas"
    cfg.NETWORK.PALLAS_INTERPRET = True
    cfg.NETWORK.PALLAS_TILE = (8, 8, 8)
    spec = resolve_sampling_spec(cfg)
    assert spec is not None and spec.interpret
    assert spec.jp == 16

    cfg.DATASET.NUM_JOINTS = 17  # COCO heads don't fit the kernel yet
    with pytest.raises(ValueError):
        resolve_sampling_spec(cfg)


def test_whole_projection_pallas_matches_quad():
    """Whole-space (HDN) projection: pallas variant == quad variant at
    the tiny profile."""
    from tests.test_model_parity import build_our_config
    from __graft_entry__ import _example_cameras
    from faster_voxelpose_tpu.models.projection import (
        make_projection_geometry,
        project_whole_pallas,
        project_whole,
    )
    from faster_voxelpose_tpu.ops.sampling import build_quad_table

    cfg = build_our_config()
    geom = make_projection_geometry(cfg)
    V, J = cfg.DATASET.CAMERA_NUM, cfg.DATASET.NUM_JOINTS
    W, H = cfg.DATASET.HEATMAP_SIZE

    spec = SampleKernelSpec(
        n_views=V, height=H, width=W, num_joints=J,
        tile=(4, 4, 8), window_x=32, window_y=32,
        exact=True, interpret=True,
    )

    rng = np.random.RandomState(2)
    hm = rng.rand(V, H, W, J).astype(np.float32)
    cams = _example_cameras(1, V)[0]

    quads = jax.vmap(build_quad_table)(jnp.asarray(hm))
    ref = project_whole(geom, quads, cams)

    hm_packed = pack_heatmaps(jnp.asarray(hm), spec)
    ours = project_whole_pallas(geom, hm_packed, cams, spec)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=5e-6)


@pytest.mark.parametrize("anchor", ["min", "center"])
def test_padded_tile_and_anchor_modes(anchor):
    """Tiles whose sample count is not 128-aligned get edge-padded lanes;
    both window-anchor modes reproduce the reference bilinear."""
    from faster_voxelpose_tpu.ops.pallas_sampling import sample_tiles

    spec = _spec(tile=(4, 4, 4), anchor=anchor)  # 64 samples -> pad to 128
    assert spec.padded_samples == 128
    rng = np.random.RandomState(3)
    hm = rng.rand(spec.n_views, spec.height, spec.width, spec.num_joints)
    hm = hm.astype(np.float32)
    nb, s = 5, spec.samples
    centers = np.stack(
        [
            rng.uniform(-6, spec.width + 6, (nb, spec.n_views, 1)),
            rng.uniform(-6, spec.height + 6, (nb, spec.n_views, 1)),
        ],
        axis=2,
    )
    coords = (centers + rng.uniform(-4, 4, (nb, spec.n_views, 2, s))).astype(
        np.float32
    )
    hp = pack_heatmaps(jnp.asarray(hm), spec)
    ours = np.asarray(sample_tiles(hp, jnp.asarray(coords), spec))
    assert ours.shape == (nb, spec.jp, s)
    ref = np.asarray(_xla_reference(jnp.asarray(hm), jnp.asarray(coords), spec))
    np.testing.assert_allclose(ours, ref, atol=5e-6)
