"""Streaming inference demo: multi-view images + calibration JSON -> 3D poses.

Capability parity with demo/visualize.ipynb (the reference's de-facto
custom-data inference API): load a config, a flat {cam_id: {R,T,...}}
calibration file and per-view images, run the jitted pipeline, write
visualizations.  This is the latency-oriented path: one frame per step,
the whole pipeline (backbone included when weights are given) in a single
jit graph that is compiled once and reused for every streamed frame.

    python run/demo.py --cfg demo/config.yaml \
        --calibration demo/calibration.json \
        --images v0.jpg v1.jpg v2.jpg v3.jpg v4.jpg \
        --torch-weights model_best.pth.tar --out out/
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Faster-VoxelPose TPU streaming demo")
    p.add_argument("--cfg", required=True)
    p.add_argument("--calibration", required=True, help="flat {cam_id: {...}} json")
    p.add_argument("--images", nargs="+", required=True, help="one image per view")
    p.add_argument("--torch-weights", default=None)
    p.add_argument("--backbone-weights", default=None)
    p.add_argument("--out", default="demo_out")
    p.add_argument("--repeat", type=int, default=1, help="re-run for latency stats")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.datasets.images import load_view_images
    from faster_voxelpose_tpu.datasets.shelf_campus import load_flat_calibration
    from faster_voxelpose_tpu.geometry.cameras import pack_rig
    from faster_voxelpose_tpu.geometry.transforms import get_resize_transform
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.models.resnet import build_backbone
    from faster_voxelpose_tpu.utils.vis import save_2d_planes

    cfg = load_config(args.cfg)
    V = cfg.DATASET.CAMERA_NUM
    assert len(args.images) == V, f"need {V} views"

    cameras = load_flat_calibration(args.calibration)
    rig = pack_rig([cameras[k] for k in sorted(cameras)][:V]).astype(np.float32)
    cams = rig[None]  # (1, V, 21)

    resize_transform = get_resize_transform(
        cfg.DATASET.ORI_IMAGE_SIZE, cfg.DATASET.IMAGE_SIZE
    )
    images = load_view_images(
        args.images, cfg.DATASET.IMAGE_SIZE, resize_transform, cfg.DATASET.COLOR_RGB
    )[None]

    model = build_model(cfg)
    backbone = build_backbone(cfg)
    rng = jax.random.PRNGKey(0)
    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    variables = model.init(
        rng, np.zeros((1, V, H, W, J), np.float32), cams, train=False
    )
    iw, ih = cfg.DATASET.IMAGE_SIZE
    backbone_vars = backbone.init(rng, np.zeros((1, ih, iw, 3), np.float32))

    if args.torch_weights:
        from faster_voxelpose_tpu.utils.weights_torch import (
            convert_model, load_torch_state_dict,
        )
        variables = convert_model(load_torch_state_dict(args.torch_weights))
    if args.backbone_weights or cfg.NETWORK.PRETRAINED_BACKBONE:
        from faster_voxelpose_tpu.utils.weights_torch import (
            convert_backbone, load_torch_state_dict,
        )
        path = args.backbone_weights or cfg.NETWORK.PRETRAINED_BACKBONE
        backbone_vars = convert_backbone(load_torch_state_dict(path), cfg.RESNET.NUM_LAYERS)

    @jax.jit
    def pipeline(variables, backbone_vars, images, cams):
        B, V = images.shape[:2]
        flat = images.reshape((B * V,) + images.shape[2:])
        hm = backbone.apply(backbone_vars, flat, train=False, mutable=False)
        heatmaps = hm.reshape((B, V) + hm.shape[1:])
        out = model.apply(variables, heatmaps, cams, train=False, mutable=False)
        return out.fused_poses, out.proposal_centers

    fused, centers = jax.block_until_ready(pipeline(variables, backbone_vars, images, cams))
    if args.repeat > 1:
        t0 = time.perf_counter()
        for _ in range(args.repeat):
            fused, centers = pipeline(variables, backbone_vars, images, cams)
        jax.block_until_ready(fused)
        dt = (time.perf_counter() - t0) / args.repeat
        print(f"steady-state latency: {dt * 1e3:.2f} ms/frame ({1 / dt:.1f} fps)")

    fused = np.asarray(fused)[0]
    centers = np.asarray(centers)[0]
    n_people = int((fused[:, 0, 3] >= 0).sum())
    print(f"detected {n_people} people")
    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "fused_poses.npy"), fused)
    path = save_2d_planes(cfg, fused, centers, os.path.join(args.out, "demo"))
    print("wrote", path)


if __name__ == "__main__":
    main()
