"""Lazy compilation + ctypes binding of the native host kernels."""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE_DIR = os.path.join(_THIS_DIR, "_cache")
_LIBS: Dict[str, Optional[ctypes.CDLL]] = {}


def _source_hash(source: str) -> str:
    with open(os.path.join(_THIS_DIR, source), "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def _load_lib(name: str) -> Optional[ctypes.CDLL]:
    """Compile <name>.cpp (once, cached by source hash) and load
    lib<name>.so.  Returns None when no C++ toolchain is available."""
    if name in _LIBS:
        return _LIBS[name]
    _LIBS[name] = None  # one attempt per process

    source = f"{name}.cpp"
    so_path = os.path.join(_CACHE_DIR, f"lib{name}_{_source_hash(source)}.so")
    if not os.path.exists(so_path):
        os.makedirs(_CACHE_DIR, exist_ok=True)
        src = os.path.join(_THIS_DIR, source)
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so_path]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            logger.info("built native %s kernel: %s", name, so_path)
        except (OSError, subprocess.SubprocessError) as e:
            logger.warning("native %s kernel unavailable (%s); using python", name, e)
            return None

    _LIBS[name] = ctypes.CDLL(so_path)
    return _LIBS[name]


def load_render_lib() -> Optional[ctypes.CDLL]:
    lib = _load_lib("render")
    if lib is None:
        return None
    lib.render_joints.restype = None
    lib.render_joints.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),  # out
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # H, W, J
        ctypes.c_int,  # M
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),  # mu
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),  # joint_id
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),  # sigma
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),  # tmp_size
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),  # scale
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),  # occl
    ]
    return lib


def load_warp_lib() -> Optional[ctypes.CDLL]:
    lib = _load_lib("warp")
    if lib is None:
        return None
    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.warp_normalize.restype = None
    lib.warp_normalize.argtypes = [
        u8, ctypes.c_int, ctypes.c_int,  # src, h_in, w_in
        f32, ctypes.c_int, ctypes.c_int,  # dst, h_out, w_out
        f32,  # inv 2x3
        f32, f32,  # mean, std
        ctypes.c_int,  # swap_rb
    ]
    lib.normalize_u8.restype = None
    lib.normalize_u8.argtypes = [
        u8, ctypes.c_int, ctypes.c_int,  # src, h, w
        f32,  # dst
        f32, f32,  # mean, std
        ctypes.c_int,  # swap_rb
    ]
    return lib


def native_available() -> bool:
    return load_render_lib() is not None


def render_joints_native(
    H: int,
    W: int,
    J: int,
    mu: np.ndarray,  # (M, 2) int32
    joint_id: np.ndarray,  # (M,) int32
    sigma: np.ndarray,  # (M,) float32
    tmp_size: np.ndarray,  # (M,) float32
    scale: np.ndarray,  # (M,) float32
    occl: np.ndarray,  # (M, 4) int32
) -> np.ndarray:
    lib = load_render_lib()
    assert lib is not None
    out = np.zeros((H, W, J), np.float32)
    M = int(mu.shape[0])
    if M:
        lib.render_joints(
            out, H, W, J, M,
            np.ascontiguousarray(mu, np.int32),
            np.ascontiguousarray(joint_id, np.int32),
            np.ascontiguousarray(sigma, np.float32),
            np.ascontiguousarray(tmp_size, np.float32),
            np.ascontiguousarray(scale, np.float32),
            np.ascontiguousarray(occl, np.int32),
        )
    return out


def warp_normalize_native(
    img: np.ndarray,  # (h_in, w_in, 3) uint8
    out_size,  # (W, H)
    inv_transform: np.ndarray,  # 2x3 dst->src affine
    mean: np.ndarray,  # (3,) float32, output-channel order
    std: np.ndarray,  # (3,) float32
    swap_rb: bool,
) -> np.ndarray:
    lib = load_warp_lib()
    assert lib is not None
    W, H = int(out_size[0]), int(out_size[1])
    dst = np.empty((H, W, 3), np.float32)
    lib.warp_normalize(
        np.ascontiguousarray(img, np.uint8), img.shape[0], img.shape[1],
        dst, H, W,
        np.ascontiguousarray(inv_transform, np.float32).reshape(-1),
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32),
        int(swap_rb),
    )
    return dst


def normalize_u8_native(
    img: np.ndarray,  # (h, w, 3) uint8
    mean: np.ndarray,
    std: np.ndarray,
    swap_rb: bool,
) -> np.ndarray:
    lib = load_warp_lib()
    assert lib is not None
    dst = np.empty(img.shape[:2] + (3,), np.float32)
    lib.normalize_u8(
        np.ascontiguousarray(img, np.uint8), img.shape[0], img.shape[1],
        dst,
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32),
        int(swap_rb),
    )
    return dst
