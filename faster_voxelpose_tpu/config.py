"""Typed configuration system.

Mirrors the key surface of the reference's global EasyDict config
(/root/reference/lib/core/config.py:15-144) so that the reference's YAML
experiment files (configs/{panoptic,shelf,campus}/jln64.yaml) load verbatim,
but is re-designed as immutable nested dataclasses: every derived shape
(voxel counts, heatmap sizes, MAX_PEOPLE) is a static Python constant by the
time a model is built, which is exactly what XLA's trace-once compilation
model wants.  Unknown keys in a YAML overlay raise (reference behaviour,
config.py:171,188).
"""

from __future__ import annotations

import dataclasses
import pathlib
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple, Union

import numpy as np
import yaml


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (int, float)):
        return (int(v), int(v))
    return (int(v[0]), int(v[1]))


def _triple_f(v) -> Tuple[float, float, float]:
    return (float(v[0]), float(v[1]), float(v[2]))


def _triple_i(v) -> Tuple[int, int, int]:
    return (int(v[0]), int(v[1]), int(v[2]))


@dataclass
class DatasetConfig:
    DATADIR: str = ""
    COLOR_RGB: bool = False
    DATA_AUGMENTATION: bool = False
    TRAIN_DATASET: str = "panoptic"
    TRAIN_HEATMAP_SRC: str = "image"
    TEST_DATASET: str = "panoptic"
    TEST_HEATMAP_SRC: str = "image"
    CAMERA_NUM: int = 5
    ORI_IMAGE_SIZE: Tuple[int, int] = (1920, 1080)
    IMAGE_SIZE: Tuple[int, int] = (960, 512)
    HEATMAP_SIZE: Tuple[int, int] = (240, 128)
    NUM_JOINTS: int = 15
    # int (single root joint) or list of two joint ids whose mean is the root
    ROOT_JOINT_ID: Union[int, List[int]] = 2
    # 'gt' heatmap sources: rasterize the Gaussians on DEVICE inside the
    # jitted step (ops/heatmap_render.py) instead of on the host — the
    # dataset then yields a (V, MAX_PEOPLE, J, 12) 'hm_params' tensor
    # (41KB/sample) in place of 'input_heatmaps' (10MB/sample)
    DEVICE_RENDER: bool = False

    def __post_init__(self):
        self.ORI_IMAGE_SIZE = _pair(self.ORI_IMAGE_SIZE)
        self.IMAGE_SIZE = _pair(self.IMAGE_SIZE)
        self.HEATMAP_SIZE = _pair(self.HEATMAP_SIZE)


@dataclass
class SyntheticConfig:
    CAMERA_FILE: str = ""
    POSE_FILE: str = ""
    MAX_PEOPLE: int = 10
    NUM_DATA: int = 10000
    DATA_AUGMENTATION: bool = True


@dataclass
class NetworkConfig:
    PRETRAINED_BACKBONE: str = ""
    NUM_CHANNEL_JOINT_FEAT: int = 32
    NUM_CHANNEL_JOINT_HIDDEN: int = 64
    SIGMA: int = 3
    BETA: float = 100.0
    # TPU-native additions (not in the reference): compute dtype for the
    # conv stacks.  Params are always f32; bf16 activations feed the MXU.
    COMPUTE_DTYPE: str = "bfloat16"
    # fusion-trunk width multiplier (1.0 = reference topology).  The
    # weight-deviating speed experiment knob: channels in the HDN/JLN
    # U-Nets and heads scale by this, rounded to multiples of 8
    # (models/blocks.py:scaled); requires retraining when != 1.0.
    WIDTH_MULT: float = 1.0
    # bilinear-sampling backend for the projection stages:
    #   'quad'   — XLA row-gather via per-frame quad tables (exact, any
    #              shape; the gather engine bounds it at ~10ns/sample)
    #   'pallas' — ops/pallas_sampling.py matmul-gather kernel (TPU only,
    #              J<=16; ~1.1ns/sample on v5e)
    #   'auto'   — pallas when running on TPU and the shapes allow it
    SAMPLING_BACKEND: str = "auto"
    # pallas kernel tuning: voxel tile per kernel block and the heatmap
    # window (x, y) it samples from.  The kernel is exact for ANY window
    # size: tiles whose pixel footprint fits the window minus a 9px
    # alignment margin take the single-window fast path, the rest fall
    # back in-kernel to an exact full-image cover loop — windows are a
    # pure speed knob (ops/pallas_sampling.py).  Defaults swept on v5e
    # (scripts/sweep_planes.py): large tiles amortize per-block fixed
    # costs; the windows keep the fast path down to ~2m camera distance.
    # round-3 sweep (scripts/sweep_planes.py, bf16-packed heatmaps):
    # tall-z (8,8,32) tiles with a full-height y window win (17.1ms vs
    # 20.3 at (8,8,8)x(40,48) for the full K=10 crop pass) — the y
    # contraction always pads its MXU K dim to 128, so a 128-tall window
    # is free FLOPs and makes every tile y-exact
    PALLAS_TILE: Tuple[int, int, int] = (8, 8, 32)
    # x window 40 measured best on v5e post plane-partials (15.42 vs
    # 15.66ms at 48, 15.91 at 32 — narrower loses more to the cover
    # loop than the smaller matmul saves); y window = full padded height
    # (static y origin: no dynamic sublane slicing, and the MXU pads the
    # contraction dim to 128 anyway)
    PALLAS_WINDOW: Tuple[int, int] = (40, 128)
    # f32-exact MXU passes (3x slower sampling); DEFAULT bf16 passes err
    # ~2e-3, below the bf16 conv stack's own noise
    PALLAS_EXACT: bool = False
    # compute the voxel->pixel projection INSIDE the JLN sampling kernel
    # (tile world origins + camera rig in, no per-sample coords tensor —
    # saves the XLA coords pass and its ~105MB/frame HBM round trip);
    # window flags from projected tile corners + interval-arithmetic
    # distortion bounds, still exact everywhere via the cover fallback.
    # ON by default since round 4: measured on v5e at the Panoptic
    # profile (scripts/check_pallas_parity.py) 11.2 -> 7.9 ms/frame at
    # K=10 forced with identical parity (0.0003mm fast / 0.0000mm exact
    # vs quad)
    PALLAS_FUSED_COORDS: bool = True
    # run the kernel in the Pallas interpreter (CPU tests only)
    PALLAS_INTERPRET: bool = False
    # whole-space (HDN) projection through the same kernel (vs ~7.2ms
    # quad on v5e).  ON by default since round 3: the full-cover slow
    # path makes near-camera / frustum-edge bins exact, so this is a pure
    # speedup (and the per-frame quad tables disappear entirely when both
    # stages run through the kernel).
    PALLAS_WHOLE: bool = True
    # swept on v5e (scripts/sweep_whole.py, Panoptic 80x80x20 @ 240x128):
    # full-z 8x8x20 pillars (1280 samples, no lane padding) at x-window
    # 64 run 2.8ms vs 6.7ms quad+table, exact, with 72% of (tile, view)
    # blocks on the anchored fast path and the rest on the exact cover
    PALLAS_WHOLE_TILE: Tuple[int, int, int] = (8, 8, 20)
    PALLAS_WHOLE_WINDOW: Tuple[int, int] = (64, 1024)  # y: clipped to Hp


@dataclass
class ResnetConfig:
    NUM_LAYERS: int = 50
    DECONV_WITH_BIAS: bool = False
    NUM_DECONV_LAYERS: int = 3
    NUM_DECONV_FILTERS: Tuple[int, ...] = (256, 256, 256)
    NUM_DECONV_KERNELS: Tuple[int, ...] = (4, 4, 4)
    FINAL_CONV_KERNEL: int = 1

    def __post_init__(self):
        self.NUM_DECONV_FILTERS = tuple(int(x) for x in self.NUM_DECONV_FILTERS)
        self.NUM_DECONV_KERNELS = tuple(int(x) for x in self.NUM_DECONV_KERNELS)


@dataclass
class TrainConfig:
    BATCH_SIZE: int = 8
    SHUFFLE: bool = True
    BEGIN_EPOCH: int = 0
    END_EPOCH: int = 10
    RESUME: bool = False
    OPTIMIZER: str = "adam"
    LR: float = 1e-4
    LAMBDA_LOSS_2D: float = 1.0
    LAMBDA_LOSS_1D: float = 1.0
    LAMBDA_LOSS_BBOX: float = 0.1
    LAMBDA_LOSS_FUSED: float = 5.0
    VISUALIZATION: bool = False
    VIS_TYPE: Tuple[str, ...] = ("2d_planes", "image_with_poses", "heatmaps")
    # HDN losses are gradient-accumulated over this many steps
    # (reference: lib/core/function.py:28).
    ACCUMULATION_STEPS: int = 4
    # The reference leaves the frozen backbone in train mode so BatchNorm
    # running stats keep drifting (run/train.py:115).  We default to truly
    # frozen stats (deterministic, jit-friendly); flip to mimic.
    UPDATE_BACKBONE_BN_STATS: bool = False
    SEED: int = 0


@dataclass
class TestConfig:
    BATCH_SIZE: int = 8
    MODEL_FILE: str = ""
    VISUALIZATION: bool = False
    VIS_TYPE: Tuple[str, ...] = ("2d_planes", "image_with_poses", "heatmaps")


@dataclass
class CaptureSpec:
    SPACE_SIZE: Tuple[float, float, float] = (4000.0, 5200.0, 2400.0)
    SPACE_CENTER: Tuple[float, float, float] = (300.0, 300.0, 300.0)
    VOXELS_PER_AXIS: Tuple[int, int, int] = (24, 32, 16)
    MAX_PEOPLE: int = 10
    MIN_SCORE: float = 0.1

    def __post_init__(self):
        self.SPACE_SIZE = _triple_f(self.SPACE_SIZE)
        self.SPACE_CENTER = _triple_f(self.SPACE_CENTER)
        self.VOXELS_PER_AXIS = _triple_i(self.VOXELS_PER_AXIS)


@dataclass
class IndividualSpec:
    SPACE_SIZE: Tuple[float, float, float] = (2000.0, 2000.0, 2000.0)
    VOXELS_PER_AXIS: Tuple[int, int, int] = (64, 64, 64)

    def __post_init__(self):
        self.SPACE_SIZE = _triple_f(self.SPACE_SIZE)
        self.VOXELS_PER_AXIS = _triple_i(self.VOXELS_PER_AXIS)


@dataclass
class ParallelConfig:
    """TPU scale-out knobs (no reference equivalent: the reference is
    single-GPU, README.md:96).  Batch is sharded over the `data` mesh axis."""

    DATA_PARALLEL: int = 1
    MESH_AXIS_NAME: str = "data"


@dataclass
class Config:
    BACKBONE: str = "resnet"
    DEVICE: str = "tpu"
    WORKERS: int = 8
    PRINT_FREQ: int = 100
    OUTPUT_DIR: str = "output"
    LOG_DIR: str = "log"
    MODEL: str = "faster_voxelpose"

    DATASET: DatasetConfig = field(default_factory=DatasetConfig)
    SYNTHETIC: SyntheticConfig = field(default_factory=SyntheticConfig)
    NETWORK: NetworkConfig = field(default_factory=NetworkConfig)
    RESNET: ResnetConfig = field(default_factory=ResnetConfig)
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    TEST: TestConfig = field(default_factory=TestConfig)
    CAPTURE_SPEC: CaptureSpec = field(default_factory=CaptureSpec)
    INDIVIDUAL_SPEC: IndividualSpec = field(default_factory=IndividualSpec)
    PARALLEL: ParallelConfig = field(default_factory=ParallelConfig)

    # ---- derived static geometry --------------------------------------
    @property
    def num_whole_bins(self) -> int:
        vx, vy, vz = self.CAPTURE_SPEC.VOXELS_PER_AXIS
        return vx * vy * vz

    @property
    def fine_voxels_per_axis(self) -> Tuple[int, int, int]:
        """Resolution of the virtual fine grid the JLN crop lives on.

        reference: lib/models/project_individual.py:26
        fine = int(whole_size / ind_size * (ind_voxels - 1)) + 1   (trunc)
        """
        whole = self.CAPTURE_SPEC.SPACE_SIZE
        ind = self.INDIVIDUAL_SPEC.SPACE_SIZE
        vox = self.INDIVIDUAL_SPEC.VOXELS_PER_AXIS
        return tuple(int(whole[a] / ind[a] * (vox[a] - 1)) + 1 for a in range(3))


# Keys present in reference YAMLs that this build deliberately has no use
# for (torch/cudnn runtime knobs, unused HRNet spec).  They are accepted and
# ignored so reference config files load unchanged.
_IGNORED_TOP_KEYS = {"CUDNN", "HIGHER_HRNET"}
_IGNORED_LEAF_KEYS = {("DATASET", "MEAN"), ("DATASET", "STD")}


def _apply_overlay(obj: Any, overlay: dict, path: str = "") -> None:
    for k, v in overlay.items():
        if path == "" and k in _IGNORED_TOP_KEYS:
            continue
        if not hasattr(obj, k):
            if (path, k) in _IGNORED_LEAF_KEYS:
                continue
            raise ValueError(f"{path + '.' if path else ''}{k} not a known config key")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _apply_overlay(cur, v, k)
            cur.__post_init__() if hasattr(cur, "__post_init__") else None
        else:
            setattr(obj, k, v)


def load_config(yaml_path: Optional[Union[str, pathlib.Path]] = None) -> Config:
    """Build a Config from defaults, overlaid with a YAML experiment file.

    Accepts the reference's YAML schema unchanged
    (reference: lib/core/config.py:174-188).
    """
    cfg = Config()
    if yaml_path is not None:
        with open(yaml_path) as f:
            overlay = yaml.safe_load(f)
        if overlay:
            _apply_overlay(cfg, overlay)
        # re-normalize tuple-typed fields after overlay
        for section in (cfg.DATASET, cfg.CAPTURE_SPEC, cfg.INDIVIDUAL_SPEC, cfg.RESNET):
            section.__post_init__()
    return cfg


def save_config(cfg: Config, yaml_path: Union[str, pathlib.Path]) -> None:
    """Dump the full resolved config (reference gen_config, config.py:191)."""

    def to_plain(o):
        if dataclasses.is_dataclass(o):
            return {f.name: to_plain(getattr(o, f.name)) for f in dataclasses.fields(o)}
        if isinstance(o, (tuple, list)):
            return [to_plain(x) for x in o]
        if isinstance(o, np.generic):
            return o.item()
        return o

    with open(yaml_path, "w") as f:
        yaml.safe_dump(to_plain(cfg), f, default_flow_style=False)


def get_model_name(cfg: Config) -> Tuple[str, str]:
    """(name, full_name) experiment identifiers
    (reference get_model_name, lib/core/config.py:201-213)."""
    name = f"{cfg.MODEL}_{cfg.RESNET.NUM_LAYERS}"
    deconv_suffix = "".join(f"d{f}" for f in cfg.RESNET.NUM_DECONV_FILTERS)
    full_name = (
        f"{cfg.DATASET.IMAGE_SIZE[1]}x{cfg.DATASET.IMAGE_SIZE[0]}_"
        f"{name}_{deconv_suffix}"
    )
    return name, full_name
