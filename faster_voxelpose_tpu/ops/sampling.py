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


# ---------------------------------------------------------------------------
# quad-table sampling: the TPU fast path
# ---------------------------------------------------------------------------
# XLA:TPU gathers single rows of a 2D table at ~7ns/row (the embedding-
# lookup fast path) but is ~80x slower for any multi-row slice (measured:
# 17.6ns for slice (1,1,J) vs 1393ns for (2,2,J) on v5e).  Four corner
# gathers per bilinear sample therefore dominate the whole pipeline (the
# JLN's 13M samples/frame cost 350ms).  Fix: precompute, once per frame, a
# table whose row (y*W + x) holds the full 2x2 bilinear patch at (y, x) —
# 4*J floats — so each sample needs exactly ONE fast-path row gather.
# Out-of-image patch entries are zero-padded; per-slot weights use the
# distance form max(0, 1-|coord - pixel|), which reproduces zeros-padding
# align_corners=True bilinear exactly (bit-validated vs torch grid_sample
# in tests/test_sampling.py).


def build_quad_table(heatmap: jnp.ndarray) -> jnp.ndarray:
    """(H, W, J) -> (H*W, 4, J): row y*W+x = [(y,x), (y,x+1), (y+1,x),
    (y+1,x+1)] with zero padding past the image edge."""
    H, W, J = heatmap.shape
    padded = jnp.pad(heatmap, ((0, 1), (0, 1), (0, 0)))
    quad = jnp.stack(
        [
            padded[:H, :W],
            padded[:H, 1 : W + 1],
            padded[1 : H + 1, :W],
            padded[1 : H + 1, 1 : W + 1],
        ],
        axis=2,
    )  # (H, W, 4, J)
    return quad.reshape(H * W, 4, J)


def _slot_weights_1d(v: jnp.ndarray, v0: jnp.ndarray) -> jnp.ndarray:
    """Per-slot bilinear weights by distance: slot s (pixel v0+s) gets
    max(0, 1 - |v - (v0+s)|); clamped-out coords fade to zero exactly as
    zeros-padding bilinear requires."""
    v0f = v0.astype(jnp.float32)
    w0 = jnp.maximum(0.0, 1.0 - jnp.abs(v - v0f))
    w1 = jnp.maximum(0.0, 1.0 - jnp.abs(v - (v0f + 1.0)))
    return w0, w1


def bilinear_sample_quad(
    quad: jnp.ndarray, coords: jnp.ndarray, height: int, width: int
) -> jnp.ndarray:
    """Sample via the quad table.

    Args:
      quad: (H*W, 4, J) from build_quad_table.
      coords: (N, 2) normalized (x, y), align_corners=True convention.
    Returns: (N, J) float32.
    """
    J = quad.shape[-1]
    x = (coords[:, 0].astype(jnp.float32) + 1.0) * 0.5 * (width - 1)
    y = (coords[:, 1].astype(jnp.float32) + 1.0) * 0.5 * (height - 1)
    x0 = jnp.clip(jnp.floor(x), 0, width - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, height - 1).astype(jnp.int32)

    wx0, wx1 = _slot_weights_1d(x, x0)
    wy0, wy1 = _slot_weights_1d(y, y0)
    w = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)  # (N,4)

    rows = y0 * width + x0  # (N,)
    flat = quad.reshape(height * width, 4 * J)
    patches = jnp.take(flat, rows, axis=0).reshape(-1, 4, J)  # one gather/sample
    return jnp.sum(patches * w[..., None], axis=1)


build_quad_table_views = jax.vmap(build_quad_table)


def sample_and_mean_views_quad(
    quads: jnp.ndarray,
    coords: jnp.ndarray,
    height: int,
    width: int,
    clamp01: bool = True,
) -> jnp.ndarray:
    """Quad-table version of sample_and_mean_views: quads (V, H*W, 4, J),
    coords (V, N, 2) -> (N, J) camera-averaged, clamped."""
    vals = jax.vmap(lambda q, c: bilinear_sample_quad(q, c, height, width))(
        quads, coords
    )
    out = jnp.mean(vals, axis=0)
    if clamp01:
        out = jnp.clip(out, 0.0, 1.0)
    return out


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
