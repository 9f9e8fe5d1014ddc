"""Bit-level parity of bilinear sampling vs torch grid_sample
(align_corners=True, padding_mode='zeros') — the exact op the reference
builds its projection layers on (project_whole.py:83)."""

import numpy as np
import pytest

import jax.numpy as jnp

from faster_voxelpose_tpu.ops.sampling import (
    bilinear_sample,
    bilinear_sample_views,
    sample_and_mean_views,
)


def torch_grid_sample(heatmap_hwj, coords_n2):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    # torch layout: (1, C, H, W), grid (1, 1, N, 2)
    hm = torch.from_numpy(np.ascontiguousarray(heatmap_hwj.transpose(2, 0, 1)))[None]
    grid = torch.from_numpy(coords_n2.astype(np.float32))[None, None]
    out = F.grid_sample(hm.float(), grid, align_corners=True)  # (1, C, 1, N)
    return out[0, :, 0, :].numpy().T  # (N, C)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_torch_random(seed):
    rng = np.random.RandomState(seed)
    H, W, J = 13, 29, 5
    hm = rng.rand(H, W, J).astype(np.float32)
    coords = rng.uniform(-1.3, 1.3, (200, 2)).astype(np.float32)
    coords = np.clip(coords, -1.1, 1.1)  # pipeline clamp
    ours = np.asarray(bilinear_sample(jnp.asarray(hm), jnp.asarray(coords)))
    ref = torch_grid_sample(hm, coords)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_matches_torch_boundary_cases():
    H, W, J = 8, 8, 2
    hm = np.arange(H * W * J, dtype=np.float32).reshape(H, W, J)
    # exact corners, edges, the -1.1/1.1 clamp values, and center
    coords = np.array(
        [
            [-1.0, -1.0],
            [1.0, 1.0],
            [-1.0, 1.0],
            [1.0, -1.0],
            [0.0, 0.0],
            [-1.1, 0.0],
            [1.1, 0.0],
            [0.0, -1.1],
            [0.0, 1.1],
            [-1.1, -1.1],
            [1.1, 1.1],
            [0.999999, 0.999999],
        ],
        dtype=np.float32,
    )
    ours = np.asarray(bilinear_sample(jnp.asarray(hm), jnp.asarray(coords)))
    ref = torch_grid_sample(hm, coords)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_view_mean_matches_loop():
    rng = np.random.RandomState(3)
    V, H, W, J, N = 4, 16, 20, 3, 111
    hms = rng.rand(V, H, W, J).astype(np.float32)
    coords = np.clip(rng.uniform(-1.2, 1.2, (V, N, 2)), -1.1, 1.1).astype(np.float32)
    fused = np.asarray(sample_and_mean_views(jnp.asarray(hms), jnp.asarray(coords)))
    per_view = np.stack([torch_grid_sample(hms[v], coords[v]) for v in range(V)])
    expect = np.clip(per_view.mean(0), 0.0, 1.0)
    np.testing.assert_allclose(fused, expect, rtol=1e-5, atol=1e-6)
