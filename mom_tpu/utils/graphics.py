"""Camera / pose math.

Numerics mirror the reference exactly (utils/graphics_utils.py:31-77 in
cvsp-lab/ICLR2025_3D-MOM) but matrices are kept in plain row-vector-free
mathematical convention: ``p_cam = W2V @ [p; 1]`` and
``p_clip = full_proj @ [p; 1]``.  (The reference stores the *transposes* of
these matrices because its CUDA kernel indexes them column-major; the product
it computes is identical.)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np


class BasicPointCloud(NamedTuple):
    points: np.ndarray   # (N, 3)
    colors: np.ndarray   # (N, 3)
    normals: np.ndarray | None


def get_world2view(R: np.ndarray, t: np.ndarray,
                   translate: np.ndarray | None = None,
                   scale: float = 1.0) -> np.ndarray:
    """World->view 4x4. ``R`` is the camera rotation as stored by the
    reference (i.e. R = W2C[:3,:3].T, see dataset_readers.py:1041) and ``t``
    the W2C translation.  Mirrors getWorld2View2 (graphics_utils.py:38-49)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        if translate is None:
            translate = np.zeros(3)
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return np.float32(Rt)


def get_projection_matrix(znear: float, zfar: float,
                          fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style asymmetric-capable frustum, z in [0, zfar/(zfar-znear)]
    convention of the reference (graphics_utils.py:51-71)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)

    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right

    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation; normalizes first.
    Mirrors build_rotation (general_utils.py:84-105)."""
    q = np.asarray(q, dtype=np.float64)
    n = np.sqrt((q * q).sum(-1, keepdims=True))
    q = q / n
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3), dtype=np.float32)
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - r * z)
    R[..., 0, 2] = 2 * (x * z + r * y)
    R[..., 1, 0] = 2 * (x * y + r * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - r * x)
    R[..., 2, 0] = 2 * (x * z - r * y)
    R[..., 2, 1] = 2 * (y * z + r * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R
