"""Camera containers.

``Camera`` mirrors the reference (scene/cameras.py:17-68) but keeps matrices
in standard math convention (see mom_tpu/utils/graphics.py) and exposes a
packed array form so a batch of cameras can be fed to a jitted step function
without retracing."""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .utils.graphics import get_world2view, get_projection_matrix


@dataclass
class Camera:
    R: np.ndarray                   # (3,3) camera rotation (W2C[:3,:3].T)
    T: np.ndarray                   # (3,) W2C translation
    fovx: float
    fovy: float
    width: int
    height: int
    time: float = 0.0
    frame_num: int = 0
    uid: int = 0
    znear: float = 0.01
    zfar: float = 100.0
    image: np.ndarray | None = None   # (H,W,3) float32 in [0,1], optional
    mask: np.ndarray | None = None
    image_name: str = ""

    world_view: np.ndarray = field(init=False)      # (4,4)
    projection: np.ndarray = field(init=False)      # (4,4)
    full_proj: np.ndarray = field(init=False)       # (4,4) = proj @ w2v
    camera_center: np.ndarray = field(init=False)   # (3,)

    def __post_init__(self):
        self.world_view = get_world2view(self.R, self.T)
        self.projection = get_projection_matrix(self.znear, self.zfar,
                                                self.fovx, self.fovy)
        self.full_proj = (self.projection @ self.world_view).astype(np.float32)
        self.camera_center = np.linalg.inv(self.world_view)[:3, 3].astype(np.float32)

    @property
    def tanfovx(self) -> float:
        return math.tan(self.fovx * 0.5)

    @property
    def tanfovy(self) -> float:
        return math.tan(self.fovy * 0.5)

    def pack(self) -> dict:
        """Flat dict of arrays for feeding a jitted render/train step."""
        return {
            "viewmatrix": self.world_view.astype(np.float32),
            "projmatrix": self.full_proj.astype(np.float32),
            "campos": self.camera_center.astype(np.float32),
            "tanfovx": np.float32(self.tanfovx),
            "tanfovy": np.float32(self.tanfovy),
            "time": np.float32(self.time),
            "frame_num": np.float32(self.frame_num),
        }


def pack_cameras(cams: list[Camera]) -> dict:
    """Stack a list of same-resolution cameras into batched arrays."""
    packs = [c.pack() for c in cams]
    return {k: np.stack([p[k] for p in packs]) for k in packs[0]}


def from_c2w(c2w: np.ndarray, fovx: float, fovy: float, width: int, height: int,
             flip_yz: bool = True, **kw) -> Camera:
    """Build a Camera from an OpenGL/Blender camera-to-world matrix, applying
    the reference's axis flip (dataset_readers.py:1038-1042)."""
    c2w = np.array(c2w, dtype=np.float64)
    if flip_yz:
        c2w = c2w.copy()
        c2w[:3, 1:3] *= -1
    w2c = np.linalg.inv(c2w)
    R = np.transpose(w2c[:3, :3])
    T = w2c[:3, 3]
    return Camera(R=R, T=T, fovx=fovx, fovy=fovy, width=width, height=height, **kw)
