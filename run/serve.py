"""Persistent inference server: JSON-lines over stdin/stdout.

The production counterpart of run/demo.py (which exits after one frame):
a long-lived process that AOT-compiles the pipeline once, then answers
frame requests until EOF.  Capability superset of the reference's
demo/visualize.ipynb inference surface.

    python run/serve.py --cfg demo/config.yaml \
        --calibration demo/calibration.json [--torch-weights best.pth.tar]

Protocol (one JSON object per line, response per line on stdout):
    {"cmd": "ping"}                                -> {"ok": true}
    {"cmd": "infer", "images": ["v0.jpg", ...]}    -> poses + latency
    {"cmd": "infer", "heatmaps": "frame.npy"}      -> poses + latency
    {"cmd": "rig", "calibration": "other.json"}    -> hot-swap cameras
    {"cmd": "stats"}                               -> latency summary
    {"cmd": "quit"}                                -> exits

`heatmaps` .npy files are (V, H, W, J) float32 — the precomputed-2D-pose
serving regime (the reference's Shelf/Campus 'pred' source).  `images`
is one path per view in camera order.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Faster-VoxelPose TPU server")
    p.add_argument("--cfg", required=True)
    p.add_argument("--calibration", required=True,
                   help="flat {cam_id: {...}} calibration json")
    p.add_argument("--torch-weights", default=None,
                   help="reference model_best.pth.tar to convert")
    p.add_argument("--backbone-weights", default=None)
    p.add_argument("--best-from", default=None, metavar="OUTPUT_DIR",
                   help="load the orbax best model trained under this dir")
    p.add_argument("--no-aot", action="store_true",
                   help="skip eager compilation (compile on first frame)")
    return p.parse_args(argv)


def build_service(args):
    import jax

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.engine.service import PoseService

    cfg = load_config(args.cfg)
    variables = backbone_vars = None
    if args.torch_weights:
        from faster_voxelpose_tpu.utils.weights_torch import (
            convert_model, load_torch_state_dict,
        )

        variables = convert_model(load_torch_state_dict(args.torch_weights))
    elif args.best_from:
        from faster_voxelpose_tpu.engine.checkpoint import load_best_model
        from faster_voxelpose_tpu.models.faster_voxelpose import build_model

        model = build_model(cfg)
        V = cfg.DATASET.CAMERA_NUM
        W, H = cfg.DATASET.HEATMAP_SIZE
        template = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, V, H, W, cfg.DATASET.NUM_JOINTS), np.float32),
            np.zeros((1, V, 21), np.float32),
            train=False,
        )
        variables = load_best_model(args.best_from, template)
    path = args.backbone_weights or cfg.NETWORK.PRETRAINED_BACKBONE
    if path:
        from faster_voxelpose_tpu.utils.weights_torch import (
            convert_backbone, load_torch_state_dict,
        )

        backbone_vars = convert_backbone(
            load_torch_state_dict(path), cfg.RESNET.NUM_LAYERS
        )

    svc = PoseService(cfg, variables=variables, backbone_vars=backbone_vars,
                      aot=not args.no_aot)
    if svc.random_init:
        # make dry-run mode unmissable: a server with untrained weights
        # answers every request with garbage poses
        print(
            "WARNING: no --torch-weights/--best-from given — serving "
            "RANDOM-INIT weights (dry-run mode, poses are meaningless)",
            file=sys.stderr,
        )
    svc.set_rig_from_calibration(args.calibration)
    return svc


def handle(svc, req: dict) -> dict:
    cmd = req.get("cmd")
    if cmd == "ping":
        return {"ok": True}
    if cmd == "stats":
        return svc.stats()
    if cmd == "rig":
        svc.set_rig_from_calibration(req["calibration"])
        return {"ok": True}
    if cmd == "infer":
        if "heatmaps" in req:
            return svc.infer_heatmaps(np.load(req["heatmaps"]))
        if "images" in req:
            return svc.infer_image_paths(req["images"])
        return {"error": "infer needs 'images' or 'heatmaps'"}
    return {"error": f"unknown cmd {cmd!r}"}


def serve(svc, fin, fout):
    """Pump the JSON-lines loop until EOF or quit; never dies on a bad
    request (serving must degrade, not crash)."""
    print(json.dumps({"ready": True, **svc.stats()}), file=fout, flush=True)
    for line in fin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            print(json.dumps({"error": f"bad json: {e}"}), file=fout,
                  flush=True)
            continue
        if req.get("cmd") == "quit":
            print(json.dumps({"ok": True, "bye": True}), file=fout,
                  flush=True)
            return
        try:
            resp = handle(svc, req)
        except Exception as e:  # noqa: BLE001 — report, keep serving
            resp = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps(resp), file=fout, flush=True)


def main(argv=None):
    args = parse_args(argv)
    svc = build_service(args)
    serve(svc, sys.stdin, sys.stdout)


if __name__ == "__main__":
    main()
