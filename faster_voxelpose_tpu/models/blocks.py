"""Reusable conv building blocks (flax/linen, channels-last NHWC/NLC).

Capability-equivalent to the reference's torch blocks
(lib/models/cnns_2d.py:12-112, lib/models/cnns_1d.py:10-109) but built
TPU-first: channels-last layouts feed XLA's TPU conv tiling directly, a
configurable compute dtype runs the conv stacks in bfloat16 on the MXU
while params/BN statistics stay float32, and the shared 2-level U-Net
("EncoderDecoder" 32-64-128-64-32 with residual skip paths) is a single
module parameterized by spatial rank instead of duplicated 1D/2D code.

Weight-init matches the reference (normal(0, 0.001), zero bias,
cnns_2d.py:137-144) so trained-from-scratch behaviour is comparable, and
module/parameter naming is chosen so the torch->jax checkpoint converter
(utils/weights_torch.py) can map released reference checkpoints onto these
modules mechanically.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

conv_init = nn.initializers.normal(stddev=0.001)


def scaled(channels: int, width: float) -> int:
    """Channel count under a width multiplier, rounded to a multiple of 8
    (VPU lane / MXU tile alignment), floor 8.  width=1.0 reproduces the
    reference topology exactly; other values are the narrow/wide-trunk
    speed-vs-quality experiment knob (NETWORK.WIDTH_MULT)."""
    if width == 1.0:
        return channels
    return max(8, int(round(channels * width / 8)) * 8)


class Deconv(nn.Module):
    """Transposed convolution with torch-compatible semantics.

    Implemented directly as a fractionally-strided correlation
    (lax.conv_general_dilated with lhs_dilation=stride and per-side padding
    kernel-1-pad), which is bit-identical in f64 to
    torch.ConvTranspose{1,2}d(kernel, stride, pad) when the converter flips
    the torch kernel spatially (verified in tests/test_backbone.py).
    Kernel layout: (*spatial, in, out).
    """

    features: int
    kernel: int
    stride: int
    pad: int  # the torch-convention "padding" argument
    rank: int = 2
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_feat = x.shape[-1]
        kshape = (self.kernel,) * self.rank + (in_feat, self.features)
        kernel = self.param("kernel", conv_init, kshape, jnp.float32)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        p = self.kernel - 1 - self.pad
        dn = {
            1: ("NHC", "HIO", "NHC"),
            2: ("NHWC", "HWIO", "NHWC"),
        }[self.rank]
        if self.kernel == 2 and self.stride == 2 and self.pad == 0:
            # k2/s2/p0 (U-Net upsamplers): y[2u+a, 2v+b] = x[u,v] @ k[1-a, 1-b]
            # — one 1x1 conv with the taps stacked on output channels +
            # interleave, instead of a 75%-zeros dilated conv.
            y = self._subpixel2(x.astype(self.dtype), kernel.astype(self.dtype))
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(1,) * self.rank,
                padding=((p, p),) * self.rank,
                lhs_dilation=(self.stride,) * self.rank,
                dimension_numbers=dn,
            )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y

    def _subpixel2(self, x, kernel):
        # (A k4/s2/p1 subpixel decomposition for the backbone deconvs was
        # measured SLOWER than XLA's dilated lowering on v5e — 7.9 vs
        # 5.7ms for the 5-view backbone — so only the tap-exact k2 case
        # keeps a fast path.)
        o = kernel.shape[-1]
        if self.rank == 1:
            n, h, _ = x.shape
            k1 = jnp.concatenate([kernel[1 - a] for a in (0, 1)], axis=-1)
            c = jnp.einsum("nhi,io->nho", x, k1)  # (N, H, 2*O)
            return c.reshape(n, h, 2, o).reshape(n, 2 * h, o)
        n, h, w, _ = x.shape
        k1 = jnp.concatenate(
            [kernel[1 - a, 1 - b] for a in (0, 1) for b in (0, 1)], axis=-1
        )  # (I, 4*O), blocks ordered (a, b)
        c = jnp.einsum("nhwi,io->nhwo", x, k1)  # (N, H, W, 4*O)
        y6 = c.reshape(n, h, w, 2, 2, o)
        return y6.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, o)


class ConvBNRelu(nn.Module):
    """conv(k) + BN + ReLU (reference Basic2DBlock / Basic1DBlock)."""

    features: int
    kernel: int
    rank: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel,) * self.rank,
            padding="SAME",
            kernel_init=conv_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)


class ResBlock(nn.Module):
    """3-3 residual block with BN, 1x1-projected skip on channel change
    (reference Res2DBlock / Res1DBlock)."""

    features: int
    rank: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (3,) * self.rank
        res = nn.Conv(self.features, k, padding="SAME", kernel_init=conv_init,
                      dtype=self.dtype, name="conv1")(x)
        res = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn1")(res)
        res = nn.relu(res)
        res = nn.Conv(self.features, k, padding="SAME", kernel_init=conv_init,
                      dtype=self.dtype, name="conv2")(res)
        res = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn2")(res)

        if x.shape[-1] == self.features:
            skip = x
        else:
            skip = nn.Conv(self.features, (1,) * self.rank, padding="VALID",
                           kernel_init=conv_init, dtype=self.dtype,
                           name="skip_conv")(x)
            skip = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                name="skip_bn")(skip)
        return nn.relu(res + skip)


class UpsampleBlock(nn.Module):
    """2x transposed-conv upsample + BN + ReLU
    (reference Upsample2DBlock / Upsample1DBlock, kernel=stride=2)."""

    features: int
    rank: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Deconv(self.features, kernel=2, stride=2, pad=0, rank=self.rank,
                   use_bias=True, dtype=self.dtype, name="deconv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _max_pool(x, rank: int):
    window = (2,) * rank
    return nn.max_pool(x, window, strides=window)


class EncoderDecoder(nn.Module):
    """Shared 2-level U-Net trunk: 32 -> 64 -> 128 -> 64 -> 32 with
    residual skip paths (reference EncoderDecorder, cnns_2d.py:74-112 and
    its 1D twin, cnns_1d.py:71-109 — unified here over spatial rank)."""

    rank: int = 2
    dtype: Any = jnp.float32
    width: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = lambda c: scaled(c, self.width)
        skip1 = ResBlock(w(32), self.rank, self.dtype, name="skip_res1")(x, train)
        x = _max_pool(x, self.rank)
        x = ResBlock(w(64), self.rank, self.dtype, name="encoder_res1")(x, train)

        skip2 = ResBlock(w(64), self.rank, self.dtype, name="skip_res2")(x, train)
        x = _max_pool(x, self.rank)
        x = ResBlock(w(128), self.rank, self.dtype, name="encoder_res2")(x, train)

        x = ResBlock(w(128), self.rank, self.dtype, name="mid_res")(x, train)

        x = ResBlock(w(128), self.rank, self.dtype, name="decoder_res2")(x, train)
        x = UpsampleBlock(w(64), self.rank, self.dtype, name="decoder_upsample2")(x, train)
        x = x + skip2

        x = ResBlock(w(64), self.rank, self.dtype, name="decoder_res1")(x, train)
        x = UpsampleBlock(w(32), self.rank, self.dtype, name="decoder_upsample1")(x, train)
        x = x + skip1
        return x


class UNetFront(nn.Module):
    """front 7-wide conv block + residual widen to 32ch, shared by
    P2PNet / CenterNet / C2CNet (reference front_layers)."""

    rank: int = 2
    dtype: Any = jnp.float32
    width: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNRelu(scaled(16, self.width), 7, self.rank, self.dtype,
                       name="front_basic")(x, train)
        x = ResBlock(scaled(32, self.width), self.rank, self.dtype,
                     name="front_res")(x, train)
        return x
