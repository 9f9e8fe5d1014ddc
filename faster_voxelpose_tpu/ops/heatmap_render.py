"""On-device Gaussian heatmap rasterization.

The reference renders input heatmaps ('gt'/'pred' sources) on the host
with per-joint windowed Gaussians (lib/dataset/JointsDataset.py:271-338).
Round 2 kept that design (numpy/C++ host renderer overlapped via loader
workers), which leaves two host-side costs on a TPU system: ~10MB of
rendered maps uploaded per sample through the host->device link, and
0.1-0.2 host-CPU seconds per sample — the measured train-loop bound on
small hosts, and (through the remote-dispatch tunnel's transfer caching)
an unbounded host-memory growth.

TPU-native fix: the dataset emits only the *parameterization* of each
Gaussian instance (center/sigma/scale/window/occlusion — 12 floats per
(person, joint, view), built by PoseDatasetBase.render_heatmap_params
with the exact same augmentation RNG draws as the host renderer), and
this module rasterizes it inside the jitted train/eval step.  Upload
drops 250x (41KB vs 10.3MB per 5-view COCO-17 sample); the rasterization
itself is a fused elementwise max-reduction over MAX_PEOPLE, ~10M exp()
on the VPU per batch — sub-millisecond, overlapped with the step.

Parity: bit-comparable math to _render_joints_numpy (same windowed
truncation, occlusion-rect zeroing, per-joint max-accumulate, [0,1]
clip); pinned by tests/test_heatmap_render.py against the host renderer
with augmentation enabled.

Parameter layout (..., K, J, 12), float32 (ints exact below 2^24):
  0 cx   effective Gaussian center x = ul_x + (2*tmp+1)//2  (host quirk:
  1 cy     centers sit on the *window* center, not exactly on the joint)
  2 inv2s2 = 1/(2 sigma^2);  0 marks a dead row (scale is 0 too)
  3 scale  augmentation magnitude (0 = instance absent)
  4 x0w, 5 x1w   window columns [x0w, x1w) after image clipping
  6 y0w, 7 y1w   window rows    [y0w, y1w)
  8 ox0, 9 ox1, 10 oy0, 11 oy1   occlusion rect in image coords
"""

from __future__ import annotations

import jax.numpy as jnp


def render_heatmaps_device(
    params: jnp.ndarray, height: int, width: int
) -> jnp.ndarray:
    """(..., K, J, 12) instance params -> (..., H, W, J) heatmaps.

    Max-accumulates over the K (person) axis with a static unrolled loop;
    every term is a fused broadcast elementwise expression, so no
    (..., K, H, W, J) intermediate is ever materialized.
    """
    p = params.astype(jnp.float32)
    K = p.shape[-3]
    lead = p.shape[:-3]
    J = p.shape[-2]

    # pixel-coordinate grids shaped for (H, W, J) broadcasting
    xs = jnp.arange(width, dtype=jnp.float32)[None, :, None]  # (1, W, 1)
    ys = jnp.arange(height, dtype=jnp.float32)[:, None, None]  # (H, 1, 1)
    xs = xs.reshape((1,) * len(lead) + (1, width, 1))
    ys = ys.reshape((1,) * len(lead) + (height, 1, 1))

    out = jnp.zeros(lead + (height, width, J), jnp.float32)
    for k in range(K):
        q = p[..., k, :, :]  # (..., J, 12)

        def f(i):
            return q[..., None, None, :, i]  # (..., 1, 1, J)

        dx = xs - f(0)
        dy = ys - f(1)
        g = f(3) * jnp.exp(-(dx * dx + dy * dy) * f(2))
        inwin = (xs >= f(4)) & (xs < f(5)) & (ys >= f(6)) & (ys < f(7))
        inoccl = (xs >= f(8)) & (xs < f(9)) & (ys >= f(10)) & (ys < f(11))
        out = jnp.maximum(out, jnp.where(inwin & ~inoccl, g, 0.0))
    return jnp.clip(out, 0.0, 1.0)
