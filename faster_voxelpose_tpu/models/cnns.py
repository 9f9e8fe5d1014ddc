"""Task heads: P2PNet (plane->pose), CenterNet (BEV center+bbox),
C2CNet (1D height), WeightNet (plane-fusion weights).

Capability parity with lib/models/cnns_2d.py:115-187, cnns_1d.py:112-143
and lib/models/weight_net.py:48-89, re-expressed channels-last in flax.
Outputs keep channels last: callers index [..., c].
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .blocks import EncoderDecoder, UNetFront, conv_init, scaled


class P2PNet(nn.Module):
    """Plane-to-pose U-Net over (N, 64, 64, J) orthographic projections,
    returning per-joint plane heatmaps (N, 64, 64, J_out)
    (reference P2PNet, cnns_2d.py:115-144)."""

    output_channels: int
    dtype: Any = jnp.float32
    width: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = UNetFront(2, self.dtype, self.width, name="front")(x, train)
        x = EncoderDecoder(2, self.dtype, self.width, name="encdec")(x, train)
        x = nn.Conv(self.output_channels, (1, 1), padding="VALID",
                    kernel_init=conv_init, dtype=self.dtype, name="output")(x)
        return x.astype(jnp.float32)


class CenterNet(nn.Module):
    """BEV detection head over the whole-space voxel cube.

    Takes (B, X, Y, Z, J), max-projects along z, runs the U-Net trunk and
    two heads: a 1ch center heatmap and a 2ch bbox-size regression
    (reference CenterNet, cnns_2d.py:147-187).
    Returns (hm (B, X, Y, 1), size (B, X, Y, 2)).
    """

    head_conv: int = 32
    dtype: Any = jnp.float32
    width: float = 1.0

    @nn.compact
    def __call__(self, cube, train: bool = False):
        x = jnp.max(cube, axis=3)  # z max-projection -> (B, X, Y, J)
        x = x.astype(self.dtype)
        x = UNetFront(2, self.dtype, self.width, name="front")(x, train)
        x = EncoderDecoder(2, self.dtype, self.width, name="encdec")(x, train)

        head_ch = scaled(self.head_conv, self.width)
        hm = nn.Conv(head_ch, (3, 3), padding="SAME", kernel_init=conv_init,
                     dtype=self.dtype, name="hm_conv")(x)
        hm = nn.relu(hm)
        hm = nn.Conv(1, (1, 1), padding="VALID", kernel_init=conv_init,
                     dtype=self.dtype, name="hm_out")(hm)

        size = nn.Conv(head_ch, (3, 3), padding="SAME", kernel_init=conv_init,
                       dtype=self.dtype, name="size_conv")(x)
        size = nn.relu(size)
        size = nn.Conv(2, (1, 1), padding="VALID", kernel_init=conv_init,
                       dtype=self.dtype, name="size_out")(size)
        return hm.astype(jnp.float32), size.astype(jnp.float32)


class C2CNet(nn.Module):
    """1D height net over per-proposal z-columns (N, Z, J) -> (N, Z)
    (reference C2CNet, cnns_1d.py:112-143)."""

    dtype: Any = jnp.float32
    width: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = UNetFront(1, self.dtype, self.width, name="front")(x, train)
        x = EncoderDecoder(1, self.dtype, self.width, name="encdec")(x, train)
        x = nn.Conv(1, (1,), padding="VALID", kernel_init=conv_init,
                    dtype=self.dtype, name="output")(x)
        return x[..., 0].astype(jnp.float32)


class WeightNet(nn.Module):
    """Per joint-plane scalar fusion weight in (0, 1).

    (3N*J, 64, 64, 1) single-channel plane heatmaps -> conv+BN+maxpool+ReLU
    -> global average pool -> 2-layer MLP -> sigmoid
    (reference WeightNet, weight_net.py:48-80; note the reference order is
    BN, then maxpool, then ReLU — kept).
    Input here: (M, H, W, J) joint plane features; output (M, J, 1).
    """

    feat_channels: int = 32
    hidden_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        M, H, W, J = x.shape
        # each joint's map processed independently: fold J into batch
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(M * J, H, W, 1)
        x = x.astype(self.dtype)
        x = nn.Conv(self.feat_channels, (3, 3), padding="SAME",
                    kernel_init=conv_init, dtype=self.dtype, name="feat_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="feat_bn")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (M*J, C)
        x = nn.Dense(self.hidden_channels, kernel_init=conv_init,
                     dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(1, kernel_init=conv_init, dtype=self.dtype, name="fc2")(x)
        x = nn.sigmoid(x.astype(jnp.float32))
        return x.reshape(M, J, 1)
