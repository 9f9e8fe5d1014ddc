"""Pinhole camera model with radial + tangential distortion.

Functionally equivalent to the reference's paired torch/numpy projection
(/root/reference/lib/utils/cameras.py:30-84), re-designed for the TPU build:

* cameras are *packed* into flat float arrays so a whole rig (and a whole
  batch of rigs) is a single device tensor — no dicts, no per-call host
  materialization (the reference re-uploads camera params on every
  projection call, cameras.py:11-18);
* the device-side projector is written in jnp on top of that packed layout
  and is vmap-compatible over (batch, view) so the voxel-grid projection of
  every view happens in one fused XLA computation.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

# Packed camera layout: 21 floats.
#   [0:9]   R (row-major 3x3 world->cam rotation)
#   [9:12]  T (camera center in world coords, mm)
#   [12:14] f (fx, fy)
#   [14:16] c (cx, cy)
#   [16:19] k (radial k1, k2, k3)
#   [19:21] p (tangential p1, p2)
CAM_PARAM_DIM = 21


def pack_camera(camera: Dict) -> np.ndarray:
    """Pack a reference-format camera dict {R,T,fx,fy,cx,cy,k,p} into a
    flat (21,) float64 array.  Accepts the calibration formats produced by
    the reference loaders (panoptic.py:194-204, shelf.py:138-153)."""
    out = np.zeros(CAM_PARAM_DIM, dtype=np.float64)
    out[0:9] = np.asarray(camera["R"], dtype=np.float64).reshape(9)
    out[9:12] = np.asarray(camera["T"], dtype=np.float64).reshape(3)
    out[12] = np.float64(np.asarray(camera["fx"]).reshape(()))
    out[13] = np.float64(np.asarray(camera["fy"]).reshape(()))
    out[14] = np.float64(np.asarray(camera["cx"]).reshape(()))
    out[15] = np.float64(np.asarray(camera["cy"]).reshape(()))
    out[16:19] = np.asarray(camera["k"], dtype=np.float64).reshape(3)
    out[19:21] = np.asarray(camera["p"], dtype=np.float64).reshape(2)
    return out


def pack_rig(cameras: Sequence[Dict]) -> np.ndarray:
    """Pack a list of per-view camera dicts into a (V, 21) array."""
    return np.stack([pack_camera(c) for c in cameras], axis=0)


def unpack_camera(packed: np.ndarray) -> Dict:
    p = np.asarray(packed)
    return {
        "R": p[0:9].reshape(3, 3),
        "T": p[9:12].reshape(3, 1),
        "fx": p[12],
        "fy": p[13],
        "cx": p[14],
        "cy": p[15],
        "k": p[16:19].reshape(3, 1),
        "p": p[19:21].reshape(2, 1),
    }


def project_points_np(x: np.ndarray, packed_cam: np.ndarray) -> np.ndarray:
    """World (N,3) -> pixel (N,2), numpy (host-side: dataset building,
    synthetic visibility checks).  Matches reference project_point_cpu
    (cameras.py:58-84) including the 1e-5 depth epsilon."""
    p = np.asarray(packed_cam, dtype=np.float64)
    R = p[0:9].reshape(3, 3)
    T = p[9:12].reshape(3, 1)
    f = p[12:14].reshape(2, 1)
    c = p[14:16].reshape(2, 1)
    k = p[16:19]
    tp = p[19:21]

    xcam = R @ (np.asarray(x, dtype=np.float64).T - T)  # (3, N)
    y = xcam[:2] / (xcam[2] + 1e-5)

    r2 = np.sum(y**2, axis=0)
    d = 1 + k[0] * r2 + k[1] * r2 * r2 + k[2] * r2 * r2 * r2
    u = y[0] * d + 2 * tp[0] * y[0] * y[1] + tp[1] * (r2 + 2 * y[0] * y[0])
    v = y[1] * d + 2 * tp[1] * y[0] * y[1] + tp[0] * (r2 + 2 * y[1] * y[1])
    yd = np.stack([u, v], axis=0)
    return (f * yd + c).T


def project_points(x: jnp.ndarray, packed_cam: jnp.ndarray) -> jnp.ndarray:
    """World (N,3) -> pixel (N,2), jnp (device-side, jit/vmap friendly).

    Same math as project_points_np; written once in jnp so XLA fuses the
    rotation matmul with the distortion polynomial on the VPU/MXU.
    vmap over the camera argument to project into a whole rig at once.
    """
    R = packed_cam[0:9].reshape(3, 3)
    T = packed_cam[9:12]
    f = packed_cam[12:14]
    c = packed_cam[14:16]
    k = packed_cam[16:19]
    tp = packed_cam[19:21]

    # 3x3 rotation as explicit multiply-adds on the VPU: jnp matmul runs at
    # XLA's *default* matmul precision, which degrades to bf16-class on the
    # MXU (and, observed, on some CPU paths) — a ~20mm error on mm-scale
    # world coordinates.  Elementwise keeps full f32 everywhere and a 3-wide
    # contraction never belonged on the systolic array anyway.
    xt = x - T[None, :]  # (N, 3)
    xcam = jnp.stack(
        [
            xt[:, 0] * R[0, 0] + xt[:, 1] * R[0, 1] + xt[:, 2] * R[0, 2],
            xt[:, 0] * R[1, 0] + xt[:, 1] * R[1, 1] + xt[:, 2] * R[1, 2],
            xt[:, 0] * R[2, 0] + xt[:, 1] * R[2, 1] + xt[:, 2] * R[2, 2],
        ],
        axis=-1,
    )
    y = xcam[:, :2] / (xcam[:, 2:3] + 1e-5)

    r2 = jnp.sum(y * y, axis=-1)
    d = 1 + k[0] * r2 + k[1] * r2 * r2 + k[2] * r2 * r2 * r2
    yx, yy = y[:, 0], y[:, 1]
    u = yx * d + 2 * tp[0] * yx * yy + tp[1] * (r2 + 2 * yx * yx)
    v = yy * d + 2 * tp[1] * yx * yy + tp[0] * (r2 + 2 * yy * yy)
    yd = jnp.stack([u, v], axis=-1)
    return yd * f[None, :] + c[None, :]
