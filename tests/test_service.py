"""Tests for the persistent inference service (engine/service.py) and
its JSON-lines CLI (run/serve.py): AOT compilation, rig hot-swap,
both inference paths, error-tolerant protocol loop.
"""

import io
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "run"))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from tests.test_cli_surfaces import _write_cfg  # tiny 3-view config


def _make_calib(tmp_path, name="calib.json", seed=None, radius=3000.0):
    from make_demo_data import make_rig

    rig = make_rig(3, radius_mm=radius, height_mm=2000.0, center=(0.0, 0.0),
                   image_size=(320, 240))
    path = str(tmp_path / name)
    with open(path, "w") as f:
        json.dump(rig, f)
    return path


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.engine.service import PoseService

    tmp_path = tmp_path_factory.mktemp("svc")
    cfg = load_config(_write_cfg(tmp_path))
    svc = PoseService(cfg, aot=True)
    svc.set_rig_from_calibration(_make_calib(tmp_path))
    return svc


def test_aot_compiles_heatmaps_only_without_backbone_weights(service):
    # no backbone weights were provided -> the expensive images graph is
    # not AOT-compiled by default (a heatmaps-only server never calls it);
    # infer_images still works via the lazy jit path, and warmup can
    # force the images graph explicitly
    assert sorted(service._compiled) == ["heatmaps"]
    assert service.random_init and service.stats()["random_init"]
    service.warmup(graphs=("heatmaps", "images"))
    assert sorted(service._compiled) == ["heatmaps", "images"]


def test_infer_heatmaps_shape_and_stats(service):
    rng = np.random.RandomState(0)
    hm = rng.rand(3, 32, 40, 15).astype(np.float32) * 0.3
    out = service.infer_heatmaps(hm)
    assert set(out) >= {"poses_mm", "scores", "n_people", "latency_ms"}
    assert out["n_people"] == len(out["poses_mm"]) == len(out["scores"])
    for pose in out["poses_mm"]:
        assert np.asarray(pose).shape == (15, 3)
    st = service.stats()
    assert st["requests"] >= 1 and st["p95_ms"] >= st["p50_ms"] > 0


def test_infer_images_runs_backbone(service):
    rng = np.random.RandomState(1)
    images = rng.randn(3, 128, 160, 3).astype(np.float32)
    out = service.infer_images(images)
    assert out["n_people"] == len(out["poses_mm"])


def test_infer_images_uint8_device_normalize(service):
    """uint8 frames (the transfer-optimal mode infer_image_paths uses)
    produce the same poses as host-normalized float32 frames."""
    from faster_voxelpose_tpu.datasets.images import normalize_image

    rng = np.random.RandomState(4)
    u8 = rng.randint(0, 256, (3, 128, 160, 3), np.uint8)  # BGR, as decoded
    # the tiny config leaves COLOR_RGB at its default False -> no swap
    assert not service.cfg.DATASET.COLOR_RGB
    f32 = np.stack([normalize_image(v) for v in u8])

    out_u8 = service.infer_images(u8)
    out_f32 = service.infer_images(f32)
    assert out_u8["n_people"] == out_f32["n_people"]
    if out_u8["n_people"]:
        np.testing.assert_allclose(
            out_u8["poses_mm"], out_f32["poses_mm"], atol=5.0
        )


def test_rig_hot_swap_no_recompile(service, tmp_path):
    """Swapping calibration must not add compiled executables and must
    change the projection (different rig -> different detections on a
    structured input)."""
    compiled_before = dict(service._compiled)
    rng = np.random.RandomState(2)
    hm = rng.rand(3, 32, 40, 15).astype(np.float32) * 0.2
    hm[:, 10:18, 14:22, :] = 1.0  # strong blob, rig-dependent landing spot
    out1 = service.infer_heatmaps(hm)

    service.set_rig_from_calibration(
        _make_calib(tmp_path, "calib2.json", radius=4500.0)
    )
    out2 = service.infer_heatmaps(hm)
    assert service._compiled == compiled_before  # hot swap, no retrace
    if out1["n_people"] and out2["n_people"]:
        assert not np.allclose(out1["poses_mm"][0], out2["poses_mm"][0])


def test_rig_shape_validation(service):
    with pytest.raises(ValueError):
        service.set_rig(np.zeros((5, 21), np.float32))


def test_serve_cli_protocol(tmp_path, monkeypatch):
    """Drive run/serve.py's full loop: build from argv, answer ping /
    infer(heatmaps) / infer(images) / rig / stats / bad json / unknown
    cmd / quit — one JSON per line, no crash on errors."""
    import cv2

    import serve

    cfg_path = _write_cfg(tmp_path)
    calib = _make_calib(tmp_path)
    rng = np.random.RandomState(3)
    hm_path = str(tmp_path / "frame.npy")
    np.save(hm_path, rng.rand(3, 32, 40, 15).astype(np.float32) * 0.3)
    image_paths = []
    for v in range(3):
        p = str(tmp_path / f"v{v}.jpg")
        cv2.imwrite(p, rng.randint(0, 255, (240, 320, 3), np.uint8))
        image_paths.append(p)

    args = serve.parse_args(["--cfg", cfg_path, "--calibration", calib])
    svc = serve.build_service(args)

    requests = [
        {"cmd": "ping"},
        {"cmd": "infer", "heatmaps": hm_path},
        {"cmd": "infer", "images": image_paths},
        {"cmd": "rig", "calibration": _make_calib(tmp_path, "c2.json",
                                                  radius=4000.0)},
        {"cmd": "infer", "heatmaps": hm_path},
        {"cmd": "infer"},             # missing payload -> error, keep going
        {"cmd": "nope"},              # unknown cmd -> error, keep going
        {"cmd": "stats"},
        {"cmd": "quit"},
    ]
    fin = io.StringIO(
        "not json\n" + "".join(json.dumps(r) + "\n" for r in requests)
    )
    fout = io.StringIO()
    serve.serve(svc, fin, fout)

    lines = [json.loads(l) for l in fout.getvalue().splitlines()]
    assert lines[0]["ready"] is True
    assert "bad json" in lines[1]["error"]
    assert lines[2] == {"ok": True}
    assert lines[3]["n_people"] >= 0 and "latency_ms" in lines[3]
    assert lines[4]["n_people"] >= 0          # image path ran the backbone
    assert lines[5] == {"ok": True}           # rig hot-swap
    assert "error" in lines[7] and "error" in lines[8]
    assert lines[9]["requests"] == 3          # three infers counted
    assert lines[10]["bye"] is True
