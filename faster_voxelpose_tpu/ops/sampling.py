"""Bilinear heatmap sampling (the TPU replacement for
torch.nn.functional.grid_sample(align_corners=True, padding_mode='zeros')).

This is the hot gather of the whole pipeline: the reference calls
F.grid_sample per batch item / per person inside Python loops
(project_whole.py:83, project_individual.py:130).  Here it is one pure
function over packed (…, H, W, J) heatmaps and (…, N, 2) normalized
coordinates, vmapped over batch/view/person, so XLA fuses the index
arithmetic, the four corner gathers and the weighted reduction into a
single kernel with static shapes.

Semantics reproduced exactly (validated bit-for-bit against torch in
tests/test_sampling.py):
* align_corners=True: x_pix = (x_norm + 1) / 2 * (W - 1)
* zeros padding: out-of-bounds corners contribute 0 through their weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(heatmap: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample one heatmap stack.

    Args:
      heatmap: (H, W, J) channels-last feature maps.
      coords:  (N, 2) normalized (x, y) in align_corners=True convention;
               values outside [-1, 1] fade to zero (zeros padding).
    Returns:
      (N, J) sampled values, float32.
    """
    H, W, J = heatmap.shape
    x = (coords[:, 0].astype(jnp.float32) + 1.0) * 0.5 * (W - 1)
    y = (coords[:, 1].astype(jnp.float32) + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def corner_weight(xi, yi, wx, wy):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        return jnp.where(valid, wx * wy, 0.0)

    w00 = corner_weight(x0, y0, wx0, wy0)
    w01 = corner_weight(x1, y0, wx1, wy0)
    w10 = corner_weight(x0, y1, wx0, wy1)
    w11 = corner_weight(x1, y1, wx1, wy1)

    x0i = jnp.clip(x0, 0, W - 1).astype(jnp.int32)
    x1i = jnp.clip(x1, 0, W - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, H - 1).astype(jnp.int32)
    y1i = jnp.clip(y1, 0, H - 1).astype(jnp.int32)

    flat = heatmap.reshape(H * W, J)

    def gather(yi, xi):
        return jnp.take(flat, yi * W + xi, axis=0)  # (N, J)

    out = (
        gather(y0i, x0i) * w00[:, None]
        + gather(y0i, x1i) * w01[:, None]
        + gather(y1i, x0i) * w10[:, None]
        + gather(y1i, x1i) * w11[:, None]
    )
    return out


# vmap over a leading view axis: heatmaps (V, H, W, J), coords (V, N, 2)
bilinear_sample_views = jax.vmap(bilinear_sample, in_axes=(0, 0))


def sample_and_mean_views(
    heatmaps: jnp.ndarray, coords: jnp.ndarray, clamp01: bool = True
) -> jnp.ndarray:
    """Sample every view and average — the multi-view aggregation step
    (the only 'collective' in the model's math; reference
    project_whole.py:83 torch.mean over cameras + clamp at :86).

    Args:
      heatmaps: (V, H, W, J), coords: (V, N, 2).
    Returns:
      (N, J) camera-averaged samples, optionally clamped to [0, 1].
    """
    vals = bilinear_sample_views(heatmaps, coords)  # (V, N, J)
    out = jnp.mean(vals, axis=0)
    if clamp01:
        out = jnp.clip(out, 0.0, 1.0)
    return out
