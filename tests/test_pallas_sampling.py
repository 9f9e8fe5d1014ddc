"""Pallas sampling kernel: semantics tests in the Pallas interpreter
(CPU).  On-chip parity + throughput are exercised by
scripts/check_pallas_parity.py and scripts/probe_pallas.py (the real
Mosaic lowering was additionally bit-checked there: max err 2.4e-7 exact
mode at the full Panoptic profile).

Round 3: the kernel is exact for ANY coordinates — tiles whose pixel
footprint exceeds the anchored window fall back in-kernel to a disjoint
full-image window cover — and joints beyond 16 run as extra lane groups.
The tests below pin both paths against the torch-bit-validated XLA
bilinear, including wild/garbage coordinates and COCO-17 profiles.
"""

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
    """hm (V,H,W,J); coords (NB,V,2,S) pixels -> (NB,JP_TOTAL,S)."""
    from faster_voxelpose_tpu.ops.sampling import bilinear_sample

    W, H, J = spec.width, spec.height, spec.num_joints
    x, y = coords[:, :, 0, :], coords[:, :, 1, :]
    c = jnp.stack([x / (W - 1) * 2 - 1, y / (H - 1) * 2 - 1], axis=-1)
    vals = jax.vmap(lambda cv: jax.vmap(bilinear_sample, (0, 0))(hm, cv))(c)
    out = jnp.clip(jnp.mean(vals, axis=1), 0.0, 1.0)
    out = jnp.pad(out, ((0, 0), (0, 0), (0, spec.jp_total - J)))
    return out.transpose(0, 2, 1)


def _random_case(spec, nb, jitter, seed=0, wild_every=None):
    """Random heatmaps + per-tile coord clusters; tiles at index
    wild_every (if set) get full-image-spread coords that cannot fit any
    anchored window, forcing the in-kernel full-cover slow path."""
    rng = np.random.RandomState(seed)
    hm = rng.rand(spec.n_views, spec.height, spec.width, spec.num_joints)
    hm = hm.astype(np.float32)
    s = spec.samples
    centers = np.stack(
        [
            rng.uniform(-6, spec.width + 6, (nb, spec.n_views, 1)),
            rng.uniform(-6, spec.height + 6, (nb, spec.n_views, 1)),
        ],
        axis=2,
    )
    coords = centers + rng.uniform(-jitter, jitter, (nb, spec.n_views, 2, s))
    if wild_every:
        for b in range(0, nb, wild_every):
            coords[b, :, 0, :] = rng.uniform(-8, spec.width + 8, (spec.n_views, s))
            coords[b, :, 1, :] = rng.uniform(-8, spec.height + 8, (spec.n_views, s))
    return hm, coords.astype(np.float32)


def test_kernel_matches_bilinear_reference():
    """Interpreter-mode kernel vs the (torch-bit-validated) XLA bilinear,
    including out-of-image coords and image-edge windows."""
    spec = _spec()
    hm, coords = _random_case(spec, nb=6, jitter=5, seed=0)
    hm_packed = pack_heatmaps(jnp.asarray(hm), spec)
    ours = np.asarray(sample_tiles(hm_packed, jnp.asarray(coords), spec))
    ref = np.asarray(_xla_reference(jnp.asarray(hm), jnp.asarray(coords), spec))
    np.testing.assert_allclose(ours, ref, atol=5e-6)


def test_slow_path_wild_coords_exact():
    """Tiles whose pixel spread exceeds any anchored window (near-camera
    bins, behind-camera garbage that lands in-image) take the full-cover
    path and still match the reference bilinear exactly."""
    spec = _spec(window_x=16, window_y=16)  # tiny windows: nx=3, ny=2
    assert spec.nx * spec.ny > 1
    hm, coords = _random_case(spec, nb=8, jitter=4, seed=1, wild_every=2)
    hm_packed = pack_heatmaps(jnp.asarray(hm), spec)
    ours = np.asarray(sample_tiles(hm_packed, jnp.asarray(coords), spec))
    ref = np.asarray(_xla_reference(jnp.asarray(hm), jnp.asarray(coords), spec))
    np.testing.assert_allclose(ours, ref, atol=5e-6)


def test_joint_groups_coco17():
    """J=17 (COCO) packs into two 16-joint lane groups; outputs match the
    reference bilinear on every joint of both groups."""
    spec = _spec(num_joints=17, window_x=16, window_y=16)
    assert spec.groups == 2 and spec.jp_total == 32
    hm, coords = _random_case(spec, nb=6, jitter=4, seed=2, wild_every=3)
    hm_packed = pack_heatmaps(jnp.asarray(hm), spec)
    assert hm_packed.shape == (2, spec.n_views, spec.hp, spec.wp * 16)
    ours = np.asarray(sample_tiles(hm_packed, jnp.asarray(coords), spec))
    ref = np.asarray(_xla_reference(jnp.asarray(hm), jnp.asarray(coords), spec))
    np.testing.assert_allclose(ours, ref, atol=5e-6)


def test_emit_planes_matches_cube_max():
    """emit_planes=True (in-kernel roll-max + selector compaction) must
    reproduce cube-then-max exactly, including masked samples, invalid
    blocks, joint groups, and slow-path tiles."""
    spec = _spec(num_joints=17, window_x=16, window_y=16)
    hm, coords = _random_case(spec, nb=8, jitter=4, seed=3, wild_every=4)
    rng = np.random.RandomState(7)
    s = spec.samples
    mask = (rng.rand(8, s) > 0.3).astype(np.float32)
    valid = np.asarray([1, 1, 0, 1, 1, 1, 0, 1], np.int32)
    hm_packed = pack_heatmaps(jnp.asarray(hm), spec)

    cube = np.asarray(
        sample_tiles(
            hm_packed, jnp.asarray(coords), spec, valid=jnp.asarray(valid),
            mask=jnp.asarray(mask),
        )
    )  # (NB, JP_TOTAL, S)
    pxy, pxz, pyz = sample_tiles(
        hm_packed, jnp.asarray(coords), spec, valid=jnp.asarray(valid),
        mask=jnp.asarray(mask), emit_planes=True,
    )
    tx, ty, tz = spec.tile
    c4 = cube.reshape(8, spec.jp_total, tx, ty, tz)
    np.testing.assert_allclose(
        np.asarray(pxy)[..., : tx * ty],
        c4.max(axis=4).reshape(8, spec.jp_total, tx * ty),
        atol=5e-6,
    )
    np.testing.assert_allclose(
        np.asarray(pxz)[..., : tx * tz],
        c4.max(axis=3).reshape(8, spec.jp_total, tx * tz),
        atol=5e-6,
    )
    np.testing.assert_allclose(
        np.asarray(pyz)[..., : ty * tz],
        c4.max(axis=2).reshape(8, spec.jp_total, ty * tz),
        atol=5e-6,
    )


def test_nondivisible_heatmap_dims():
    """H/W not divisible by 8 get zero-padded in pack_heatmaps — sampling
    the pad rows/cols reproduces zeros-padding bilinear bit-exactly, and
    window clip bounds stay non-negative (the round-2 advisor finding)."""
    spec = _spec(height=30, width=38, window_x=40, window_y=32)
    assert spec.hp == 32 and spec.wp == 40
    assert spec.xw == 40 and spec.yw == 32  # clipped to the padded dims
    hm, coords = _random_case(spec, nb=5, jitter=6, seed=3)
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
    assert spec.jp == 16 and spec.groups == 1

    cfg.DATASET.NUM_JOINTS = 17  # COCO heads pack into two lane groups
    spec17 = resolve_sampling_spec(cfg)
    assert spec17 is not None and spec17.groups == 2


def test_resolve_sampling_spec_single_window_clears_fused():
    """PALLAS_FUSED_COORDS (default ON) must fall back to precomputed
    coords on single-window profiles: sample_tiles_fused requires
    nx*ny > 1 and would raise at apply time otherwise (the TINY 40x32
    heatmaps fit entirely inside one (40, 128) window)."""
    from tests.test_model_parity import build_our_config
    from faster_voxelpose_tpu.models.faster_voxelpose import (
        resolve_sampling_spec,
    )

    cfg = build_our_config()
    cfg.NETWORK.SAMPLING_BACKEND = "pallas"
    cfg.NETWORK.PALLAS_INTERPRET = True
    cfg.NETWORK.PALLAS_TILE = (8, 8, 8)
    assert cfg.NETWORK.PALLAS_FUSED_COORDS  # the round-4 default
    spec = resolve_sampling_spec(cfg)
    assert spec is not None
    assert spec.nx == 1 and spec.ny == 1
    assert not spec.fused_coords


def test_resolve_sampling_spec_shelf_profile():
    """The real Shelf config (COCO-17, 200x152 heatmaps) resolves to a
    kernel spec since round 3 (the round-2 J<=16 + whole-heatmap-VMEM
    gates are lifted by lane grouping)."""
    import pathlib

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.models.faster_voxelpose import (
        resolve_sampling_spec,
    )

    cfg = load_config(
        pathlib.Path(__file__).parent.parent / "configs" / "shelf" / "jln64.yaml"
    )
    cfg.NETWORK.SAMPLING_BACKEND = "pallas"
    cfg.NETWORK.PALLAS_INTERPRET = True
    spec = resolve_sampling_spec(cfg)
    assert spec is not None
    assert spec.groups == 2 and spec.num_joints == 17
    # one 16-joint group of 5-view 200x152 heatmaps is VMEM-resident
    assert spec.n_views * spec.hp * spec.wp * 16 * 4 <= 12 * 2**20


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


def test_whole_projection_exact_near_camera():
    """The round-2 kernel lost up to ~0.1 on bins in the 1.0-1.5m
    frustum shell of a camera (docs/DESIGN.md).  With the full-cover
    slow path, a rig with a camera 0.8m from the volume matches the quad
    path on ALL bins to float32 accuracy."""
    from faster_voxelpose_tpu.geometry.cameras import pack_rig
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
        tile=(4, 4, 8), window_x=16, window_y=16,  # tiny: force slow path
        exact=True, interpret=True,
    )

    rng = np.random.RandomState(4)
    hm = rng.rand(V, H, W, J).astype(np.float32)
    cams = np.asarray(_example_cameras(1, V)[0]).copy()
    # move camera 0 to 800mm from the space center, looking through the
    # volume: many bins sit closer than 1m / behind the image plane
    center = np.asarray(cfg.CAPTURE_SPEC.SPACE_CENTER)
    near = pack_rig(
        [
            {
                "R": np.eye(3),
                "T": (center + np.array([0.0, -800.0, 0.0]))[:, None],
                "fx": 260.0,
                "fy": 260.0,
                "cx": W / 2.0,
                "cy": H / 2.0,
                "k": np.zeros((3, 1)),
                "p": np.zeros((2, 1)),
            }
        ]
    )[0]
    cams[0] = near
    cams = jnp.asarray(cams)

    quads = jax.vmap(build_quad_table)(jnp.asarray(hm))
    ref = project_whole(geom, quads, cams)
    hm_packed = pack_heatmaps(jnp.asarray(hm), spec)
    ours = project_whole_pallas(geom, hm_packed, cams, spec)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_padded_tile_lanes():
    """Tiles whose sample count is not 128-aligned get edge-padded lanes
    and still reproduce the reference bilinear."""
    spec = _spec(tile=(4, 4, 4))  # 64 samples -> pad to 128
    assert spec.padded_samples == 128
    hm, coords = _random_case(spec, nb=5, jitter=4, seed=3)
    hp = pack_heatmaps(jnp.asarray(hm), spec)
    ours = np.asarray(sample_tiles(hp, jnp.asarray(coords), spec))
    assert ours.shape == (5, spec.jp_total, spec.samples)
    ref = np.asarray(_xla_reference(jnp.asarray(hm), jnp.asarray(coords), spec))
    np.testing.assert_allclose(ours, ref, atol=5e-6)


def test_fused_coords_matches_quad():
    """sample_tiles_fused end to end through the JLN driver: in-kernel
    voxel->pixel projection + corner-interval window flags reproduce the
    quad path (which the coords-pass kernel already matches).  Includes
    a person close to a camera (footprint blows past any window -> depth
    precondition or fast-bit fails -> exact cover fallback)."""
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
        exact=True, interpret=True, fused_coords=True,
    )

    rng = np.random.RandomState(1)
    hm = rng.rand(V, H, W, J).astype(np.float32)
    cams = _example_cameras(1, V)[0]

    K = 4
    centers = rng.uniform(-1000, 1000, (K, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(600, 1000, K)
    # last person sits almost on top of camera 0 (wild footprint)
    cam_pos = np.asarray(cams[0, 9:12])
    centers[K - 1] = cam_pos + np.array([120.0, 80.0, -250.0], np.float32)
    tl, _ = compute_crop_origin(geom, jnp.asarray(centers))
    bbox = rng.uniform(0.3, 0.9, (K, 2)).astype(np.float32)
    valid = jnp.asarray([True, True, False, True])

    quads = jax.vmap(build_quad_table)(jnp.asarray(hm))
    ref = project_individual_planes(geom, quads, cams, tl, bbox, valid)

    hm_packed = pack_heatmaps(jnp.asarray(hm), spec)
    ours = project_individual_planes_pallas(
        geom, hm_packed, cams, tl, bbox, valid, spec
    )
    # in-kernel coords match the XLA pass to f32 rounding; bilinear
    # weights inherit that drift, hence the slightly looser atol than
    # the coords-pass variant's 5e-6
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fused_corner_bounds_contain_samples():
    """The exactness-critical invariant of the fused path: the interval
    window bounds (projected tile corners + interval distortion) CONTAIN
    every true per-sample pixel support, for strong distortion and for
    tiles near/behind the camera (which must simply fail the fast bit)."""
    from faster_voxelpose_tpu.geometry.example_rigs import (
        dome_camera, perimeter_camera,
    )
    from faster_voxelpose_tpu.geometry.cameras import pack_rig
    from faster_voxelpose_tpu.geometry.grids import project_to_norm_coords
    from faster_voxelpose_tpu.ops.pallas_sampling import (
        FusedProj, compute_window_flags_fused,
    )

    W, H = 48, 40
    spec = SampleKernelSpec(
        n_views=3, height=H, width=W, num_joints=5,
        tile=(4, 4, 8), window_x=24, window_y=32,
        exact=True, interpret=True, fused_coords=True,
    )
    cam_list = [
        dome_camera(0, 3, ori_image_size=(320, 240)),
        perimeter_camera(1, 3, space_center=(0, 0, 900),
                         ori_image_size=(320, 240), radius_range=(2500, 3000)),
        dome_camera(2, 3, ori_image_size=(320, 240),
                    radius_range=(500, 700)),  # close-in: wild tiles
    ]
    # crank the distortion far beyond any real rig
    cam_list[0]["k"] = np.array([[-0.6], [0.3], [-0.05]])
    cam_list[0]["p"] = np.array([[5e-3], [-4e-3]])
    cams = jnp.asarray(pack_rig(cam_list).astype(np.float32))

    step = (60.0, 60.0, 40.0)
    rt = np.array([[0.5, 0.0, 0.0], [0.0, 0.5, 0.0]], np.float64)
    fp = FusedProj(
        step=step, t=tuple(rt.ravel()), clip_hi=320.0,
        hm_w=float(W), hm_h=float(H), img_w=160.0, img_h=120.0,
        wm1=float(W - 1), hm1=float(H - 1),
    )

    rng = np.random.RandomState(7)
    nb = 64
    # origins all around (and inside!) the rig, including behind cameras
    origins = rng.uniform(-3500, 3500, (nb, 3)).astype(np.float32)
    origins[:, 2] = rng.uniform(-500, 2500, nb)
    flags = np.asarray(compute_window_flags_fused(
        jnp.asarray(origins), cams, spec, fp
    ))

    # true per-sample pixel coords via the XLA projection chain
    tx, ty, tz = spec.tile
    offs = np.stack(np.meshgrid(
        np.arange(tx), np.arange(ty), np.arange(tz), indexing="ij"
    ), -1).reshape(-1, 3).astype(np.float32) * np.asarray(step, np.float32)
    pts = origins[:, None, :] + offs[None]  # (nb, S, 3)

    def pix(cam, p):
        norm = project_to_norm_coords(
            jnp.asarray(p), cam, jnp.asarray(rt, jnp.float32),
            (320, 240), (160, 120), (W, H),
        )
        return np.asarray(
            (norm + 1.0) * 0.5 * jnp.asarray([W - 1, H - 1], jnp.float32)
        )

    for v in range(3):
        xy = np.stack([pix(cams[v], pts[b]) for b in range(nb)])  # (nb,S,2)
        w1, w2 = flags[:, v, 1], flags[:, v, 2]
        ax, bx = (w1 & 0xFFFF) - 1, (w1 >> 16) - 1
        ay, by = (w2 & 0xFFFF) - 1, (w2 >> 16) - 1
        for b in range(nb):
            x, y = xy[b, :, 0], xy[b, :, 1]
            # support pixels of in-image samples
            for val, lo_b, hi_b, dim in ((x, ax[b], bx[b], W),
                                         (y, ay[b], by[b], H)):
                lo = np.floor(val)
                hi = lo + 1
                ok = (hi >= 0) & (lo <= dim - 1)
                if not ok.any():
                    continue
                smin = np.clip(lo[ok], 0, dim - 1).min()
                smax = np.clip(hi[ok], 0, dim - 1).max()
                assert lo_b <= smin and smax <= hi_b, (
                    v, b, lo_b, smin, smax, hi_b,
                )
