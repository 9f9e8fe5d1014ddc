"""Persistent inference service: the serving-oriented wrapper around the
jitted pipeline.

The reference's only custom-data inference surface is a notebook
(demo/visualize.ipynb) that rebuilds the model per run; a production
deployment wants a long-lived process that compiles once and answers
frames for hours.  `PoseService` provides that:

- **AOT compilation** (``jax.jit(...).lower(...).compile()``): both the
  images->poses and heatmaps->poses graphs are compiled eagerly at
  startup, so the first real frame pays zero compile latency.  The
  compiled executables are reused for every request.
- **Camera-rig hot-swap**: the packed (V, 21) rig is a runtime *argument*
  of the compiled graph, not a baked constant, so switching to a new
  calibration (`set_rig`) costs one host->device transfer — no retrace,
  no recompile.  This matches the reference's per-sequence camera
  handling (lib/models/project_whole.py:75-82 caches per-seq grids; here
  the projection math is evaluated in-graph from the rig argument).
- **Latency accounting**: per-request wall time and an aggregate summary
  (count / mean / p50 / p95), the serving analogue of the reference's
  AverageMeter (lib/core/function.py:177-192).

`run/serve.py` wraps this in a JSON-lines protocol; tests drive both on
a tiny CPU config (tests/test_service.py).
"""

from __future__ import annotations

import collections
import time
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


class PoseService:
    """Long-lived, compile-once multi-person 3D pose inference.

    Parameters
    ----------
    cfg : loaded config (faster_voxelpose_tpu.config.load_config)
    variables : model variables; None -> random init (dry-run mode)
    backbone_vars : backbone variables; None -> random init.  The
        heatmaps path never touches the backbone, so services that only
        see precomputed heatmaps can skip backbone weights entirely.
    rig : packed (V, 21) float32 rig (geometry.cameras.pack_rig); may be
        swapped later with set_rig.
    aot : compile both pipelines eagerly at construction (default True).
    """

    def __init__(self, cfg, variables=None, backbone_vars=None,
                 rig: Optional[np.ndarray] = None, aot: bool = True):
        import jax

        from faster_voxelpose_tpu.models.faster_voxelpose import build_model
        from faster_voxelpose_tpu.models.resnet import build_backbone

        self.cfg = cfg
        self._jax = jax
        V = cfg.DATASET.CAMERA_NUM
        self._V = V
        self._W, self._H = cfg.DATASET.HEATMAP_SIZE
        self._J = cfg.DATASET.NUM_JOINTS
        self._iw, self._ih = cfg.DATASET.IMAGE_SIZE

        self.model = build_model(cfg)
        self.backbone = build_backbone(cfg)
        rngk = jax.random.PRNGKey(0)
        # random-init is a dry-run/testing mode, never a deployment:
        # track it so serving surfaces can report it (a server answering
        # with untrained weights must be distinguishable from a real one)
        self.random_init = variables is None
        self._has_backbone_weights = backbone_vars is not None
        if variables is None:
            variables = self.model.init(
                rngk,
                np.zeros((1, V, self._H, self._W, self._J), np.float32),
                np.zeros((1, V, 21), np.float32),
                train=False,
            )
        if backbone_vars is None:
            backbone_vars = self.backbone.init(
                rngk, np.zeros((1, self._ih, self._iw, 3), np.float32)
            )
        self.variables = jax.device_put(variables)
        self.backbone_vars = jax.device_put(backbone_vars)
        self._rig = None
        if rig is not None:
            self.set_rig(rig)

        model, backbone = self.model, self.backbone

        def _heatmaps_fn(variables, heatmaps, cams):
            out = model.apply(variables, heatmaps, cams, train=False,
                              mutable=False)
            return out.fused_poses, out.proposal_centers

        def _images_fn(variables, backbone_vars, images, cams):
            if images.dtype == np.uint8:
                # uint8 transfer mode (infer_image_paths): normalize +
                # RGB swap on device, fused into the backbone stem
                from faster_voxelpose_tpu.datasets.images import (
                    normalize_images_device,
                )

                images = normalize_images_device(
                    images, cfg.DATASET.COLOR_RGB
                )
            B, Vv = images.shape[:2]
            flat = images.reshape((B * Vv,) + images.shape[2:])
            hm = backbone.apply(backbone_vars, flat, train=False,
                                mutable=False)
            return _heatmaps_fn(
                variables, hm.reshape((B, Vv) + hm.shape[1:]), cams
            )

        self._heatmaps_jit = jax.jit(_heatmaps_fn)
        self._images_jit = jax.jit(_images_fn)
        self._compiled: Dict[str, object] = {}
        # bounded history: a long-lived server at streaming rates would
        # otherwise grow this without limit; percentiles over the most
        # recent window are what an operator wants anyway
        self._latencies_ms = collections.deque(maxlen=10000)
        self._total_requests = 0
        if aot:
            self.warmup()

    # -- compilation ----------------------------------------------------

    def _hm_spec(self):
        import jax

        return (
            jax.ShapeDtypeStruct((1, self._V, self._H, self._W, self._J),
                                 np.float32),
            jax.ShapeDtypeStruct((1, self._V, 21), np.float32),
        )

    def warmup(self, graphs: Optional[Tuple[str, ...]] = None):
        """AOT-compile the requested graphs for batch 1 (the streaming
        shape).  Default: 'heatmaps' always; 'images_u8' (the uint8
        on-device-normalize graph infer_image_paths uses) only when
        backbone weights were provided — a precomputed-2D-pose server
        should not pay the backbone graph's compile (the most expensive
        in the process) for a path it never calls.  Pass any of
        'heatmaps' / 'images' (pre-normalized float32) / 'images_u8'
        explicitly to force those graphs."""
        import jax

        if graphs is None:
            # 'images_u8' is the uint8-transfer graph infer_image_paths
            # dispatches to -- the streaming server's actual image path
            graphs = (
                ("heatmaps", "images_u8")
                if self._has_backbone_weights
                else ("heatmaps",)
            )
        hm, cams = self._hm_spec()
        if "heatmaps" in graphs and "heatmaps" not in self._compiled:
            self._compiled["heatmaps"] = (
                self._heatmaps_jit.lower(self.variables, hm, cams).compile()
            )
        for name, dtype in (("images", np.float32), ("images_u8", np.uint8)):
            if name in graphs and name not in self._compiled:
                img = jax.ShapeDtypeStruct(
                    (1, self._V, self._ih, self._iw, 3), dtype
                )
                self._compiled[name] = self._images_jit.lower(
                    self.variables, self.backbone_vars, img, cams
                ).compile()
        return sorted(self._compiled)

    # -- rig management --------------------------------------------------

    def set_rig(self, rig: np.ndarray):
        """Hot-swap the camera calibration (no recompile).

        Accepts a packed (V, 21) rig or a (1, V, 21) batch of one.
        """
        rig = np.asarray(rig, np.float32)
        if rig.ndim == 2:
            rig = rig[None]
        if rig.shape != (1, self._V, 21):
            raise ValueError(
                f"rig shape {rig.shape} != (1, {self._V}, 21)"
            )
        self._rig = self._jax.device_put(rig)

    def set_rig_from_calibration(self, path: str):
        """Load a flat {cam_id: {R,T,fx,...}} calibration JSON (the
        reference's demo/calibration.json format, shelf.py:138-153)."""
        from faster_voxelpose_tpu.datasets.shelf_campus import (
            load_flat_calibration,
        )
        from faster_voxelpose_tpu.geometry.cameras import pack_rig

        cameras = load_flat_calibration(path)
        keys = sorted(cameras)[: self._V]
        self.set_rig(pack_rig([cameras[k] for k in keys]))

    def _require_rig(self):
        if self._rig is None:
            raise RuntimeError(
                "no camera rig set — call set_rig/set_rig_from_calibration"
            )
        return self._rig

    # -- inference --------------------------------------------------------

    @staticmethod
    def _decode(fused, centers):
        fused = np.asarray(fused)[0]
        centers = np.asarray(centers)[0]
        valid = fused[:, 0, 3] >= 0
        return {
            "poses_mm": fused[valid][:, :, :3].tolist(),
            "scores": fused[valid][:, 0, 4].tolist(),
            "n_people": int(valid.sum()),
        }

    def infer_heatmaps(self, heatmaps: np.ndarray) -> dict:
        """(V, H, W, J) or (1, V, H, W, J) float32 heatmaps -> poses."""
        rig = self._require_rig()
        heatmaps = np.asarray(heatmaps, np.float32)
        if heatmaps.ndim == 4:
            heatmaps = heatmaps[None]
        t0 = time.perf_counter()
        fn = self._compiled.get("heatmaps", self._heatmaps_jit)
        fused, centers = self._jax.block_until_ready(
            fn(self.variables, heatmaps, rig)
        )
        ms = (time.perf_counter() - t0) * 1e3
        self._record(ms)
        out = self._decode(fused, centers)
        out["latency_ms"] = round(ms, 3)
        return out

    def infer_images(self, images: np.ndarray) -> dict:
        """(V, ih, iw, 3) or (1, V, ih, iw, 3) images -> poses.

        float32 inputs are taken as already ImageNet-normalized (RGB if
        cfg COLOR_RGB); uint8 inputs are decoded BGR frames and the
        normalize+swap runs on device (the transfer-optimal path)."""
        rig = self._require_rig()
        images = np.asarray(images)
        if images.dtype != np.uint8:
            images = images.astype(np.float32)
        if images.ndim == 4:
            images = images[None]
        key = "images_u8" if images.dtype == np.uint8 else "images"
        t0 = time.perf_counter()
        fn = self._compiled.get(key, self._images_jit)
        fused, centers = self._jax.block_until_ready(
            fn(self.variables, self.backbone_vars, images, rig)
        )
        ms = (time.perf_counter() - t0) * 1e3
        self._record(ms)
        out = self._decode(fused, centers)
        out["latency_ms"] = round(ms, 3)
        return out

    def infer_image_paths(self, paths: Sequence[str]) -> dict:
        """Load one image per view from disk (resize-warped to the
        network input frame) and run the full pipeline.  Frames ship to
        the device as uint8 and normalize on-chip (4x smaller uploads,
        zero host normalize cost)."""
        from faster_voxelpose_tpu.datasets.images import load_view_images_u8
        from faster_voxelpose_tpu.geometry.transforms import (
            get_resize_transform,
        )

        if len(paths) != self._V:
            raise ValueError(f"need {self._V} views, got {len(paths)}")
        rt = get_resize_transform(
            self.cfg.DATASET.ORI_IMAGE_SIZE, self.cfg.DATASET.IMAGE_SIZE
        )
        images = load_view_images_u8(
            list(paths), self.cfg.DATASET.IMAGE_SIZE, rt
        )
        return self.infer_images(images)

    # -- observability ----------------------------------------------------

    def _record(self, ms: float):
        self._latencies_ms.append(ms)
        self._total_requests += 1

    def stats(self) -> dict:
        lat = np.asarray(self._latencies_ms, np.float64)
        if lat.size == 0:
            return {"requests": 0, "random_init": self.random_init}
        return {
            "requests": self._total_requests,  # lifetime count
            # percentiles over the most recent <=10k requests
            "mean_ms": round(float(lat.mean()), 3),
            "p50_ms": round(float(np.percentile(lat, 50)), 3),
            "p95_ms": round(float(np.percentile(lat, 95)), 3),
            "compiled": sorted(self._compiled),
            "random_init": self.random_init,
        }
