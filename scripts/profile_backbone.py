"""Per-stage backbone timing on the real chip (scan-slope method).

Splits the PoseResNet into stem / layer1..4 / deconv head / final conv,
times each in isolation at the Panoptic bench shapes (V=5 views of
512x960, bf16), and prints measured-vs-theoretical MXU efficiency per
stage so the optimization target is a measurement, not a guess.

FLOP model: MACs*2, bf16 peak 197 TFLOP/s on v5e.

Usage: python scripts/profile_backbone.py [stem,l1,l2,l3,l4,deconv,final,full,s2d]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

PEAK = 197e12  # v5e bf16 FLOP/s


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from profile_stages import slope

    from faster_voxelpose_tpu.models.resnet import (
        RESNET_SPEC, Bottleneck, PoseResNet, _bn,
    )
    from faster_voxelpose_tpu.models.blocks import Deconv

    only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None

    def want(tag):
        return only is None or tag in only

    V, ih, iw = 5, 512, 960
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def time_mod(tag, mod, in_shape, flops):
        if not want(tag):
            return
        x = jnp.asarray(rng.rand(*in_shape), jnp.float32)
        vs = mod.init(key, x)
        t = slope(
            lambda a: mod.apply(vs, a, mutable=False).astype(jnp.float32)[
                :, 0, 0, 0
            ],
            x,
        )
        eff = flops / max(t, 1e-12) / PEAK
        print(
            f"{tag:8s} in={in_shape}: {t*1e3:7.3f} ms  "
            f"({flops/1e9:6.1f} GF, {eff*100:5.1f}% of bf16 peak)",
            flush=True,
        )
        return t

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = x.astype(dtype)
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, dtype=dtype, name="conv1")(x)
            x = _bn(False, dtype, "bn1")(x)
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    class Layer(nn.Module):
        planes: int
        blocks: int
        stride: int

        @nn.compact
        def __call__(self, x):
            x = x.astype(dtype)
            inplanes = x.shape[-1]
            for b in range(self.blocks):
                s = self.stride if b == 0 else 1
                down = b == 0 and (s != 1 or inplanes != self.planes * 4)
                x = Bottleneck(self.planes, s, down, dtype,
                               name=f"b{b}")(x, train=False)
                inplanes = self.planes * 4
            return x

    class DeconvHead(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = x.astype(dtype)
            for i in range(3):
                x = Deconv(256, kernel=4, stride=2, pad=1, rank=2,
                           use_bias=False, dtype=dtype, name=f"d{i}")(x)
                x = _bn(False, dtype, f"bn{i}")(x)
                x = nn.relu(x)
            return x

    class Final(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(15, (1, 1), dtype=dtype, name="final")(
                x.astype(dtype)
            )

    # per-image MAC counts (x2 for FLOPs, x V images)
    def gf(macs):
        return macs * 2 * V

    px0 = (ih // 2) * (iw // 2)       # 256x480 (stem conv output)
    px1 = (ih // 4) * (iw // 4)       # 128x240
    px2 = (ih // 8) * (iw // 8)       # 64x120
    px3 = (ih // 16) * (iw // 16)     # 32x60
    px4 = (ih // 32) * (iw // 32)     # 16x30

    def bott_macs(inp, planes, px_in, px_out, down):
        m = inp * planes * px_in + 9 * planes * planes * px_out \
            + planes * 4 * planes * px_out
        if down:
            m += inp * planes * 4 * px_out
        return m

    time_mod("stem", Stem(), (V, ih, iw, 3), gf(px0 * 7 * 7 * 3 * 64))
    time_mod(
        "l1", Layer(64, 3, 1), (V, ih // 4, iw // 4, 64),
        gf(bott_macs(64, 64, px1, px1, True)
           + 2 * bott_macs(256, 64, px1, px1, False)),
    )
    time_mod(
        "l2", Layer(128, 4, 2), (V, ih // 4, iw // 4, 256),
        gf(bott_macs(256, 128, px1, px2, True)
           + 3 * bott_macs(512, 128, px2, px2, False)),
    )
    time_mod(
        "l3", Layer(256, 6, 2), (V, ih // 8, iw // 8, 512),
        gf(bott_macs(512, 256, px2, px3, True)
           + 5 * bott_macs(1024, 256, px3, px3, False)),
    )
    time_mod(
        "l4", Layer(512, 3, 2), (V, ih // 16, iw // 16, 1024),
        gf(bott_macs(1024, 512, px3, px4, True)
           + 2 * bott_macs(2048, 512, px4, px4, False)),
    )
    # deconv k4/s2: 4 effective taps per output px
    time_mod(
        "deconv", DeconvHead(), (V, ih // 32, iw // 32, 2048),
        gf(4 * 2048 * 256 * px3 + 4 * 256 * 256 * px2 + 4 * 256 * 256 * px1),
    )
    time_mod("final", Final(), (V, ih // 4, iw // 4, 256), gf(256 * 15 * px1))

    if want("full"):
        bb = PoseResNet(num_layers=50, num_joints=15, dtype=dtype)
        x = jnp.asarray(rng.rand(V, ih, iw, 3), jnp.float32)
        vs = bb.init(key, x[:1])
        t = slope(
            lambda a: bb.apply(vs, a, train=False, mutable=False)[:, 0, 0, 0],
            x,
        )
        total_macs = (
            px0 * 7 * 7 * 3 * 64
            + bott_macs(64, 64, px1, px1, True)
            + 2 * bott_macs(256, 64, px1, px1, False)
            + bott_macs(256, 128, px1, px2, True)
            + 3 * bott_macs(512, 128, px2, px2, False)
            + bott_macs(512, 256, px2, px3, True)
            + 5 * bott_macs(1024, 256, px3, px3, False)
            + bott_macs(1024, 512, px3, px4, True)
            + 2 * bott_macs(2048, 512, px4, px4, False)
            + 4 * 2048 * 256 * px3 + 4 * 256 * 256 * px2
            + 4 * 256 * 256 * px1 + 256 * 15 * px1
        )
        eff = gf(total_macs) / max(t, 1e-12) / PEAK
        print(
            f"{'full':8s}: {t*1e3:7.3f} ms  ({gf(total_macs)/1e9:6.1f} GF, "
            f"{eff*100:5.1f}% of bf16 peak)"
        )

    if want("s2d"):
        # space-to-depth stem candidate: 2x2 blocks -> 12ch input, conv1
        # becomes k4/s1-equivalent math (exactly re-expressible from the
        # reference 7x7/s2 weights by zero-padding to 8x8 and splitting);
        # measures whether the C=3 MXU underutilization matters
        class S2DStem(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = x.astype(dtype)
                B, H, W, C = x.shape
                x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(
                    0, 1, 3, 2, 4, 5
                ).reshape(B, H // 2, W // 2, 4 * C)
                x = nn.Conv(64, (4, 4), strides=(1, 1), padding="SAME",
                            use_bias=False, dtype=dtype, name="conv1")(x)
                x = _bn(False, dtype, "bn1")(x)
                x = nn.relu(x)
                return nn.max_pool(
                    x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
                )

        time_mod("s2d", S2DStem(), (V, ih, iw, 3),
                 gf(px0 * 4 * 4 * 12 * 64))

    if want("s2dslice"):
        # space-to-depth via 4 strided slices + concat (no 6-D transpose
        # relayout), then the k4/s1 12-channel conv
        class S2DSliceStem(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = x.astype(dtype)
                parts = [
                    x[:, dy::2, dx::2, :]
                    for dy in (0, 1)
                    for dx in (0, 1)
                ]
                x = jnp.concatenate(parts, axis=-1)  # (B, H/2, W/2, 12)
                x = nn.Conv(64, (4, 4), strides=(1, 1), padding="SAME",
                            use_bias=False, dtype=dtype, name="conv1")(x)
                x = _bn(False, dtype, "bn1")(x)
                x = nn.relu(x)
                return nn.max_pool(
                    x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
                )

        time_mod("s2dslice", S2DSliceStem(), (V, ih, iw, 3),
                 gf(px0 * 4 * 4 * 12 * 64))

    if want("padc8"):
        # zero-pad the 3 input channels to 8 before the 7x7/s2 conv
        class PadC8Stem(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = x.astype(dtype)
                x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
                x = nn.Conv(64, (7, 7), strides=(2, 2),
                            padding=((3, 3), (3, 3)), use_bias=False,
                            dtype=dtype, name="conv1")(x)
                x = _bn(False, dtype, "bn1")(x)
                x = nn.relu(x)
                return nn.max_pool(
                    x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
                )

        time_mod("padc8", PadC8Stem(), (V, ih, iw, 3),
                 gf(px0 * 7 * 7 * 8 * 64))

    if want("k8"):
        # zero-pad the 7x7 kernel to 8x8 (exactly weight-transformable)
        class K8Stem(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = x.astype(dtype)
                x = nn.Conv(64, (8, 8), strides=(2, 2),
                            padding=((3, 4), (3, 4)), use_bias=False,
                            dtype=dtype, name="conv1")(x)
                x = _bn(False, dtype, "bn1")(x)
                x = nn.relu(x)
                return nn.max_pool(
                    x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
                )

        time_mod("k8", K8Stem(), (V, ih, iw, 3),
                 gf(px0 * 8 * 8 * 3 * 64))

    if want("fusedpool"):
        # fold the 2x2-of-3x3 maxpool windows into the conv's output
        # stride instead of materializing the 256x480x64 pre-pool map:
        # conv at stride 2 then reduce_window is what XLA sees today;
        # here conv emits directly at stride 4 for the 4 pool phases.
        # (Not weight-equivalent alone — measures the traffic headroom.)
        class Stride4Stem(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = x.astype(dtype)
                x = nn.Conv(64, (7, 7), strides=(4, 4),
                            padding=((3, 3), (3, 3)), use_bias=False,
                            dtype=dtype, name="conv1")(x)
                x = _bn(False, dtype, "bn1")(x)
                return nn.relu(x)

        time_mod("fusedpool", Stride4Stem(), (V, ih, iw, 3),
                 gf((px0 // 4) * 7 * 7 * 3 * 64))


if __name__ == "__main__":
    main()
