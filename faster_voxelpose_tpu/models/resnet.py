"""Pose-ResNet 2D heatmap backbone (Simple-Baselines style).

Capability parity with lib/models/resnet.py: ResNet-{18,34,50,101,152}
trunk, three 4x4-stride-2 transposed-conv upsampling layers (256ch), and a
1x1 per-joint output conv producing heatmaps at 1/4 input resolution.
Re-built in flax, channels-last, with a configurable compute dtype so the
trunk runs bfloat16 on the MXU.  Module names line up with the torch
state_dict structure so utils/weights_torch.py can convert the released
pose_resnet50_panoptic checkpoint.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .blocks import Deconv


def _bn(train: bool, dtype, name: str):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=dtype, name=name,
    )


class BasicBlock(nn.Module):
    """2-conv residual block (ResNet-18/34)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding="SAME", use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = _bn(train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = _bn(train, self.dtype, "bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            identity = _bn(train, self.dtype, "down_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1-3-1 bottleneck block (ResNet-50/101/152)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = _bn(train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding="SAME", use_bias=False, dtype=self.dtype,
                      name="conv2")(out)
        out = _bn(train, self.dtype, "bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = _bn(train, self.dtype, "bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="down_conv")(x)
            identity = _bn(train, self.dtype, "down_bn")(identity)
        return nn.relu(out + identity)


RESNET_SPEC = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


class PoseResNet(nn.Module):
    """ResNet trunk + deconv upsampling + per-joint heatmap head.

    Input (B, H, W, 3) normalized RGB; output (B, H/4, W/4, J) heatmaps.
    """

    num_layers: int = 50
    num_joints: int = 15
    deconv_filters: Sequence[int] = (256, 256, 256)
    deconv_kernels: Sequence[int] = (4, 4, 4)
    deconv_with_bias: bool = False
    final_conv_kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, layout = RESNET_SPEC[self.num_layers]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _bn(train, self.dtype, "bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), layout)
        ):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or inplanes != planes * block_cls.expansion)
                x = block_cls(planes, s, down, self.dtype,
                              name=f"layer{stage + 1}_{b}")(x, train)
                inplanes = planes * block_cls.expansion

        # upsampling deconvs: torch ConvTranspose2d(k=4, s=2, p=1) == 2x
        # upsample (parity validated in tests/test_backbone.py)
        for i, (f, k) in enumerate(zip(self.deconv_filters, self.deconv_kernels)):
            assert k == 4, "only kernel-4 deconvs supported (reference default)"
            x = Deconv(f, kernel=k, stride=2, pad=1, rank=2,
                       use_bias=self.deconv_with_bias, dtype=self.dtype,
                       name=f"deconv{i + 1}")(x)
            x = _bn(train, self.dtype, f"deconv_bn{i + 1}")(x)
            x = nn.relu(x)

        pad = (self.final_conv_kernel - 1) // 2
        x = nn.Conv(self.num_joints, (self.final_conv_kernel,) * 2,
                    padding=((pad, pad), (pad, pad)), dtype=self.dtype,
                    name="final")(x)
        return x.astype(jnp.float32)


def build_backbone(cfg) -> PoseResNet:
    return PoseResNet(
        num_layers=cfg.RESNET.NUM_LAYERS,
        num_joints=cfg.DATASET.NUM_JOINTS,
        deconv_filters=tuple(cfg.RESNET.NUM_DECONV_FILTERS),
        deconv_kernels=tuple(cfg.RESNET.NUM_DECONV_KERNELS),
        deconv_with_bias=cfg.RESNET.DECONV_WITH_BIAS,
        final_conv_kernel=cfg.RESNET.FINAL_CONV_KERNEL,
        dtype=jnp.dtype(cfg.NETWORK.COMPUTE_DTYPE),
    )
