"""Stage-1 orchestration — the MotionOptimization pipeline
(train_motion.py:34-207, 426-464):

  depth -> unproject to world PCD -> re-render from 5x5 synthetic poses ->
  per-view 2D flow -> 3D scene-flow optimization -> looping video

All heavy steps run jitted on device; the host only does image IO and the
train_data dict assembly (saved in the reference's torch-pickle format so
either stage-2 implementation can consume it)."""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from ..utils.trajectory import get_pcd_gen_poses
from . import pcd as pcd_mod
from .depth import DepthEstimator
from .flow import FlowEstimator
from .sceneflow import (optimize_scene_flow, sample_dense_flow,
                        densify_point_flow)
from .video import generate_loop_frames
from .flow_viz import flow2img


def read_hints_json(file_path: str):
    """Labelme 'hint*' line annotations -> [xs_start, ys_start, xs_end,
    ys_end] (train_motion.py:376-392)."""
    hx_s, hy_s, hx_e, hy_e = [], [], [], []
    data = json.load(open(file_path))
    for shape in data["shapes"]:
        if shape["label"].startswith("hint"):
            start, end = np.array(shape["points"])
            hx_s.append(int(start[0]))
            hy_s.append(int(start[1]))
            hx_e.append(int(end[0]))
            hy_e.append(int(end[1]))
    return [hx_s, hy_s, hx_e, hy_e]


class MotionOptimization:
    def __init__(self, src_img, pcdgenpath: str = "lookaround",
                 depth_backend: str = "auto", flow_backend: str = "hints",
                 depth_ckpt: str | None = None, flow_ckpt: str | None = None):
        from PIL import Image
        if isinstance(src_img, Image.Image):
            self.src_arr = np.asarray(src_img.convert("RGB"))
        else:
            self.src_arr = np.asarray(src_img)
        H, W = self.src_arr.shape[:2]
        self.cam = pcd_mod.camera_model(W, H)
        self.W, self.H = W, H
        self.depth_model = DepthEstimator(depth_backend, depth_ckpt)
        self.flow_model = FlowEstimator(flow_backend, flow_ckpt)
        self.render_poses = get_pcd_gen_poses(pcdgenpath)
        self.src_depth = self.depth_model.infer(self.src_arr)
        self.center_depth = float(np.mean(
            self.src_depth[H // 2 - 10:H // 2 + 10,
                           W // 2 - 10:W // 2 + 10]))
        self.internal_poses = get_pcd_gen_poses(
            "hemisphere", {"center_depth": self.center_depth})

    # ------------------------------------------------------------------
    def render_pcd(self, src_mask: np.ndarray, hints):
        """(train_data dict, none_idx list) — render_PCD equivalent
        (train_motion.py:211-366)."""
        from PIL import Image
        H, W = self.H, self.W
        mask3 = np.repeat(np.asarray(src_mask)[..., None], 3, -1)
        mask3 = (mask3 > 0).astype(np.float32)

        R0 = self.render_poses[0, :3, :3]
        T0 = self.render_poses[0, :3, 3:4]
        pts_world = pcd_mod.unproject(self.src_depth, self.cam, R0, T0)
        colors = self.src_arr.reshape(-1, 3).astype(np.float32) / 255.0
        mask_colors = mask3.reshape(-1, 3)

        # hints lifted to world (train_motion.py:229-247); NOTE the
        # reference builds the pixel vector as [y, x, 1]*depth — an apparent
        # axis swap — and projects hints with it consistently; we use the
        # consistent [x, y, 1] convention end-to-end.
        def lift(hx, hy):
            d = self.src_depth[int(hy), int(hx)]
            pix = np.array([[hx], [hy], [1.0]]) * d
            cam = np.linalg.inv(self.cam.K) @ pix
            return (np.linalg.inv(R0) @ cam
                    - np.linalg.inv(R0) @ T0).astype(np.float32)

        hint_start_world = [lift(hints[0][k], hints[1][k])
                            for k in range(len(hints[0]))]
        hint_end_world = [lift(hints[2][k], hints[3][k])
                          for k in range(len(hints[0]))]

        traindata = {
            "camera_angle_x": self.cam.fovx,
            "camera_angle_y": self.cam.fovy,
            "W": W, "H": H,
            "pcd_points": pts_world,
            "pcd_colors": colors,
            "pcd_masks": mask_colors,
            "frames": [],
        }

        renderer = pcd_mod.make_view_renderer(W, H)
        pts_j = jnp.asarray(pts_world)
        col_j = jnp.asarray(colors)
        mc_j = jnp.asarray(mask_colors)
        K_j = jnp.asarray(self.cam.K)

        none_idx = []
        n_i, n_j = len(self.render_poses), len(self.internal_poses)
        for i in range(n_i):
            for j in range(n_j):
                idx = i * n_j + j
                Rw2j, Tw2j = pcd_mod.compose_pose(self.render_poses,
                                                  self.internal_poses, i, j)
                rgb, msk, none_flag = renderer(
                    pts_j, col_j, mc_j, K_j, jnp.asarray(Rw2j, jnp.float32),
                    jnp.asarray(Tw2j, jnp.float32))
                if bool(none_flag):
                    none_idx.append(idx)
                    continue

                hs_x, hs_y, he_x, he_y = [], [], [], []
                for hw in hint_start_world:
                    pc = self.cam.K @ (Rw2j @ hw + Tw2j)
                    pc = pc / pc[2]
                    hs_x.append(pc[0])
                    hs_y.append(pc[1])
                for hw in hint_end_world:
                    pc = self.cam.K @ (Rw2j @ hw + Tw2j)
                    pc = pc / pc[2]
                    he_x.append(pc[0])
                    he_y.append(pc[1])

                rgb8 = np.asarray(rgb * 255).astype(np.uint8)
                msk8 = np.asarray(msk[..., 0] * 255).astype(np.uint8)
                traindata["frames"].append({
                    "image": Image.fromarray(rgb8),
                    "transform_matrix": pcd_mod.c2w_export(Rw2j, Tw2j).tolist(),
                    "mask": Image.fromarray(msk8),
                    "final_hint_start_x": hs_x,
                    "final_hint_start_y": hs_y,
                    "final_hint_end_x": he_x,
                    "final_hint_end_y": he_y,
                    "T2C_flow": [],
                    "our_flow": [],
                })
        return traindata, none_idx

    # ------------------------------------------------------------------
    def estimate_flow(self, train_data: dict) -> dict:
        """Per-view 2D flow (train_motion.py:368-374)."""
        for idx, frame in enumerate(train_data["frames"]):
            img = np.asarray(frame["image"], np.float32) / 255.0
            mask = (np.asarray(frame["mask"], np.float32) / 255.0 > 0.5)
            hs = list(zip(np.ravel(frame["final_hint_start_x"]),
                          np.ravel(frame["final_hint_start_y"])))
            he = list(zip(np.ravel(frame["final_hint_end_x"]),
                          np.ravel(frame["final_hint_end_y"])))
            flow = self.flow_model.estimate(img, mask.astype(np.float32),
                                            hs, he, seed=idx)
            frame["T2C_flow"].append(jnp_to_torch(flow))
        return train_data

    # ------------------------------------------------------------------
    def optimize_motion(self, train_data: dict, none_idx,
                        train_iteration: int = 200):
        """3D scene-flow optimization (train_motion.py:65-207)."""
        pts = jnp.asarray(train_data["pcd_points"])
        n_i, n_j = len(self.render_poses), len(self.internal_poses)

        Ks, Rs, Ts, gts, valids, pose_idx = [], [], [], [], [], []
        frame_k = 0
        for i in range(n_i):
            for j in range(n_j):
                idx = i * n_j + j
                if idx in none_idx:
                    continue
                frame = train_data["frames"][frame_k]
                frame_k += 1
                Rw2j, Tw2j = pcd_mod.compose_pose(self.render_poses,
                                                  self.internal_poses, i, j)
                Rj = jnp.asarray(Rw2j, jnp.float32)
                Tj = jnp.asarray(Tw2j, jnp.float32)
                pix, z, valid = pcd_mod.project(pts, jnp.asarray(self.cam.K),
                                                Rj, Tj, self.W, self.H)
                gt_dense = np.asarray(frame["T2C_flow"][0])[0]  # (2, H, W)
                gt_at_pts = sample_dense_flow(
                    jnp.asarray(gt_dense.transpose(1, 2, 0)), pix)
                Ks.append(self.cam.K)
                Rs.append(np.asarray(Rj))
                Ts.append(np.asarray(Tj))
                gts.append(np.asarray(gt_at_pts
                                      * valid[None, :].astype(jnp.float32)))
                valids.append(np.asarray(valid))
                pose_idx.append(idx)

        flow, losses = optimize_scene_flow(
            pts, jnp.asarray(np.stack(Ks)), jnp.asarray(np.stack(Rs)),
            jnp.asarray(np.stack(Ts)), jnp.asarray(np.stack(gts)),
            jnp.asarray(np.stack(valids), jnp.float32),
            epochs=train_iteration)
        print(f"scene-flow optimization: loss {float(losses[0]):.4f} -> "
              f"{float(losses[-1]):.4f}")

        # dense our_flow per frame (train_motion.py:196-200)
        for k, idx in enumerate(pose_idx):
            Rj = jnp.asarray(Rs[k])
            Tj = jnp.asarray(Ts[k])
            pix0, _, valid = pcd_mod.project(pts, jnp.asarray(self.cam.K),
                                             Rj, Tj, self.W, self.H)
            pix1, _, _ = pcd_mod.project(pts + flow, jnp.asarray(self.cam.K),
                                         Rj, Tj, self.W, self.H)
            delta = np.asarray(pix1 - pix0)
            dense = densify_point_flow(np.asarray(pix0), delta,
                                       np.asarray(valid), self.H, self.W)
            train_data["frames"][k]["our_flow"].append(
                jnp_to_torch(dense[None]))

        return train_data, np.asarray(flow)     # (3, N)


def jnp_to_torch(arr):
    import torch
    return torch.tensor(np.asarray(arr))


def save_video_frames(frames, output_dir: str, W: int, H: int):
    """PNG frames + mp4 (train_motion.py:402-423)."""
    from PIL import Image
    from ..utils.videoio import write_mp4
    video_dir = os.path.join(output_dir, "video")
    os.makedirs(video_dir, exist_ok=True)
    resized = []
    for i, frame in enumerate(frames):
        arr = (np.asarray(frame) * 255).astype(np.uint8)
        img = Image.fromarray(arr).resize((W, H))
        img.save(os.path.join(video_dir, f"{i:06d}.png"))
        resized.append(np.asarray(img))
    write_mp4(os.path.join(video_dir, "sampled_video.mp4"), resized, fps=30)


def viz_flow_dir(train_data: dict, viz_dir: str):
    from PIL import Image
    os.makedirs(viz_dir, exist_ok=True)
    for idx, frame in enumerate(train_data["frames"]):
        our_flow = np.asarray(frame["our_flow"][0])[0]
        img = flow2img(our_flow)
        Image.fromarray(img).save(
            os.path.join(viz_dir, str(idx).zfill(3) + ".png"))
