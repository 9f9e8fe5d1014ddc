"""BEV proposal decoding: max-pool-equality NMS + top-k.

Pure-XLA re-expression of the reference decode (lib/core/proposal.py):
the 3x3 max-pool becomes lax.reduce_window, the suppression is an
elementwise equality mask, and the proposal selection is lax.top_k with
static K = MAX_PEOPLE — no dynamic shapes anywhere.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax


def maxpool_nms_2d(prob_map: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep only local maxima of (..., H, W) under a kernel x kernel window
    (reference max_pool2D, proposal.py:21-25): non-peaks are zeroed."""
    pad = (kernel - 1) // 2
    ndim = prob_map.ndim
    window = (1,) * (ndim - 2) + (kernel, kernel)
    strides = (1,) * ndim
    padding = [(0, 0)] * (ndim - 2) + [(pad, pad), (pad, pad)]
    pooled = lax.reduce_window(prob_map, -jnp.inf, lax.max, window, strides, padding)
    return jnp.where(prob_map == pooled, prob_map, 0.0)


def nms2d_topk(
    prob_map: jnp.ndarray, max_num: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS + flatten + top-k decode (reference nms2D, proposal.py:27-33).

    Args:
      prob_map: (B, H, W) BEV center heatmap.
      max_num: static K (MAX_PEOPLE).
    Returns:
      topk_values: (B, K), topk_index: (B, K, 2) integer (x=row, y=col)
      grid coords, topk_flat_index: (B, K) flattened row-major index.
    """
    B, H, W = prob_map.shape
    suppressed = maxpool_nms_2d(prob_map)
    flat = suppressed.reshape(B, H * W)
    topk_values, topk_flat = lax.top_k(flat, max_num)
    ix = topk_flat // W
    iy = topk_flat % W
    topk_index = jnp.stack([ix, iy], axis=-1)
    return topk_values, topk_index, topk_flat
