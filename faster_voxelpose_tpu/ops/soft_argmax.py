"""Soft-argmax decoding over orthographic plane heatmaps.

Equivalent to reference SoftArgmaxLayer (joint_localization_net.py:15-33):
a temperature-beta softmax over the flattened plane, an expectation against
the plane's world-coordinate grid, and a confidence = mean over planes and
joints of the per-map max probability.  Written as one batched einsum so
the probability/coordinate contraction runs on the MXU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def soft_argmax(
    plane_features: jnp.ndarray, center_grids: jnp.ndarray, beta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Args:
      plane_features: (3, N, J, P) per-plane per-person per-joint heatmaps,
        plane dims flattened row-major (P = vox0 * vox1).
      center_grids: (3, P, 2) world coordinates of each plane's bins.
      beta: softmax temperature (cfg.NETWORK.BETA).
    Returns:
      poses: (3, N, J, 2) expected 2D coordinates per plane,
      confs: (N,) mean over planes/joints of the max probability.
    """
    x = jax.nn.softmax(beta * plane_features.astype(jnp.float32), axis=-1)
    confs = jnp.mean(jnp.max(x, axis=-1), axis=(0, 2))  # (N,)
    # (3,N,J,P) x (3,P,2) -> (3,N,J,2).  precision=highest: the expectation
    # contracts probabilities against mm-scale coordinates, and XLA's
    # default (bf16-class) matmul precision costs millimeters of accuracy.
    poses = jnp.einsum(
        "pnjb,pbc->pnjc",
        x,
        center_grids.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return poses, confs
