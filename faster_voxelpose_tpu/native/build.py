"""Lazy compilation + ctypes binding of the native render kernel."""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE_DIR = os.path.join(_THIS_DIR, "_cache")
_LIB = None
_TRIED = False


def _source_hash() -> str:
    with open(os.path.join(_THIS_DIR, "render.cpp"), "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def load_render_lib() -> Optional[ctypes.CDLL]:
    """Compile (once, cached by source hash) and load librender.so.
    Returns None when no C++ toolchain is available."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True

    so_path = os.path.join(_CACHE_DIR, f"librender_{_source_hash()}.so")
    if not os.path.exists(so_path):
        os.makedirs(_CACHE_DIR, exist_ok=True)
        src = os.path.join(_THIS_DIR, "render.cpp")
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so_path]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            logger.info("built native render kernel: %s", so_path)
        except (OSError, subprocess.SubprocessError) as e:
            logger.warning("native render kernel unavailable (%s); using python", e)
            return None

    lib = ctypes.CDLL(so_path)
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
    _LIB = lib
    return _LIB


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
