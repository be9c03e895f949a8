"""Scene / dataset layer: builds the camera splits and GT image stacks from a
stage-1 ``train_data`` artifact.

Mirrors the live reader path (scene/dataset_readers.py readNerfSyntheticInfo
:1160-1202 with readCamerasFromTransforms_MVS :1022-1057, _Wframe :802-868,
generateCamerasFromTransforms_one_path :990-1019) and the Scene facade
(scene/__init__.py:23-114):

- train (stage 1 / coarse): the ~25 multi-view renders at t=0, frame_num=0
- train_2 (stage 2 / fine): the generated video frames under MOM/video/ with
  the CENTER view's pose (center_view=2, dataset_readers.py:818), time =
  idx/(n_frames-1), frame_num = idx; plus the static views at t=0
- test = train (the reference aliases them, dataset_readers.py:1192)
- four video trajectories: 60 poses each with fixed focal 582.69
  (dataset_readers.py:994), time = idx/(n_video_frames-1) — QUIRK: the video
  timeline spans only the first 60 of the n_frames timestamps, preserved

``train_data`` loading supports the reference's torch pickle
(MOM/train_data.pth with PIL images) and our npz equivalent.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import numpy as np

from ..cameras import Camera, from_c2w
from ..utils.graphics import get_world2view, BasicPointCloud

FOCAL = 5.8269e+02          # train_motion.py:52 / dataset_readers.py:994
CENTER_VIEW = 2             # dataset_readers.py:818


def load_train_data(path: str) -> dict:
    """Load stage-1 train_data from .pth (torch pickle) or .npz."""
    if path.endswith(".npz"):
        raw = np.load(path, allow_pickle=True)
        return {k: raw[k].item() if raw[k].dtype == object else raw[k]
                for k in raw.files} | {"frames": list(raw["frames"])}
    import torch
    data = torch.load(path, map_location="cpu", weights_only=False)
    return data


def _to_uint8_rgb(image, white_background: bool) -> np.ndarray:
    """PIL/array image -> (H, W, 3) uint8 with alpha composited on bg
    (dataset_readers.py:1045-1050)."""
    arr = np.array(image)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, -1)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    if arr.shape[-1] == 4:
        norm = arr.astype(np.float32) / 255.0
        bg = np.array([1, 1, 1]) if white_background else np.array([0, 0, 0])
        rgb = norm[..., :3] * norm[..., 3:4] + bg * (1 - norm[..., 3:4])
        arr = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
    return arr[..., :3]


def _get_nerfpp_norm(cams: list[Camera]) -> dict:
    """getNerfppNorm (dataset_readers.py:62-83)."""
    centers = np.stack([c.camera_center for c in cams], axis=1)
    avg = centers.mean(axis=1, keepdims=True)
    diagonal = np.max(np.linalg.norm(centers - avg, axis=0))
    return {"translate": -avg.flatten(), "radius": diagonal * 1.1}


@dataclass
class SceneData:
    train_cams: list          # stage-1 (coarse) cameras, with images
    train2_cams: list         # stage-2 (fine) cameras, with images
    test_cams: list
    video_cams: dict          # name -> list[Camera]
    point_cloud: BasicPointCloud
    scene_flow: np.ndarray    # (N, 3)
    cameras_extent: float
    width: int
    height: int
    xyz_max: np.ndarray = field(default=None)
    xyz_min: np.ndarray = field(default=None)


def load_scene(train_data_path: str, white_background: bool = False,
               traj_dir: str = "test_trajectory",
               video_dir: str | None = None) -> SceneData:
    data = load_train_data(train_data_path)
    fovx = float(data["camera_angle_x"])
    fovy = float(data["camera_angle_y"])
    W = int(data["W"])
    H = int(data["H"])
    frames = data["frames"]

    # ---- stage-1 cameras (MVS views at t=0)
    train_cams = []
    for idx, frame in enumerate(frames):
        img = _to_uint8_rgb(frame["image"], white_background)
        cam = from_c2w(np.array(frame["transform_matrix"]), fovx, fovy,
                       img.shape[1], img.shape[0], time=0.0, frame_num=0,
                       uid=idx, image=img)
        train_cams.append(cam)

    # ---- stage-2 cameras: generated video frames at the center view
    video_dir = video_dir or os.path.join(
        os.path.dirname(train_data_path), "video")
    train2_cams = []
    n_video = 0
    if os.path.isdir(video_dir):
        from PIL import Image
        names = sorted(f for f in os.listdir(video_dir)
                       if f.endswith((".jpg", ".jpeg", ".png")))
        n_video = len(names)
        c2w = np.array(frames[CENTER_VIEW]["transform_matrix"])
        for idx, fname in enumerate(names):
            img = _to_uint8_rgb(Image.open(os.path.join(video_dir, fname)),
                                white_background)
            t = idx / max(n_video - 1, 1)
            train2_cams.append(from_c2w(c2w, fovx, fovy, img.shape[1],
                                        img.shape[0], time=t, frame_num=idx,
                                        uid=idx, image=img))
    # plus the static views at t=0 (dataset_readers.py:845-865)
    for idx, cam in enumerate(train_cams):
        train2_cams.append(Camera(R=cam.R, T=cam.T, fovx=fovx, fovy=fovy,
                                  width=cam.width, height=cam.height,
                                  time=0.0, frame_num=0, uid=idx,
                                  image=cam.image))

    # ---- video trajectory cameras
    from .trajectories import load_trajectory, NAMES
    aspect = W / H
    f_x = FOCAL * aspect
    f_y = FOCAL
    vfovx = 2 * math.atan(W / (2 * f_x))
    vfovy = 2 * math.atan(H / (2 * f_y))
    n_time = max(n_video, 60)
    video_cams = {}
    for name in NAMES:
        R_list, t_list = load_trajectory(traj_dir, name)
        cams = []
        for idx in range(min(60, len(R_list))):
            t = (idx * 2.0 / max(n_time - 1, 1)) / 2.0
            cams.append(Camera(R=R_list[idx], T=t_list[idx], fovx=vfovx,
                               fovy=vfovy, width=W, height=H, time=t,
                               frame_num=idx, uid=idx))
        video_cams[name] = cams

    pcd_points = np.asarray(data["pcd_points"], np.float32).T   # (N, 3)
    pcd_colors = np.asarray(data["pcd_colors"], np.float32)

    sf_path = os.path.join(os.path.dirname(train_data_path), "scene_flow.pth")
    if os.path.exists(sf_path):
        if sf_path.endswith(".pth"):
            import torch
            sf = torch.load(sf_path, map_location="cpu", weights_only=False)
            scene_flow = np.asarray(sf.detach() if hasattr(sf, "detach")
                                    else sf, np.float32).T
        else:
            scene_flow = np.load(sf_path)["scene_flow"]
    else:
        scene_flow = np.zeros_like(pcd_points)

    norm = _get_nerfpp_norm(train_cams)
    return SceneData(
        train_cams=train_cams, train2_cams=train2_cams,
        test_cams=train_cams, video_cams=video_cams,
        point_cloud=BasicPointCloud(points=pcd_points, colors=pcd_colors,
                                    normals=None),
        scene_flow=scene_flow, cameras_extent=float(norm["radius"]),
        width=W, height=H,
        xyz_max=pcd_points.max(axis=0), xyz_min=pcd_points.min(axis=0))
