"""Render-trajectory loading.

The reference ships four camera paths as torch pickles of R/t tensor lists
(test_trajectory/{name}_{R,t}_list, loaded in dataset_readers.py:1168-1175).
All four have identity rotations and short translation paths (up-down, side,
zoom-in: 60-step linsapces; circle: 90-step Lissajous-like loop).

This loader reads, in order of preference:
  1. ``{name}.npz`` (our converted format: R (N,3,3), t (N,3))
  2. the reference torch pickles if present
  3. procedural fallbacks reproducing the linspace paths
"""

from __future__ import annotations

import os

import numpy as np

NAMES = ("up-down", "side", "zoom-in", "circle")


def _procedural(name: str):
    if name == "up-down":
        t = np.stack([np.zeros(60), np.round(np.linspace(0.08, -0.08, 60), 4),
                      np.zeros(60)], -1)
    elif name == "side":
        t = np.stack([np.round(np.linspace(0.09, -0.09, 60), 4),
                      np.zeros(60), np.zeros(60)], -1)
    elif name == "zoom-in":
        t = np.stack([np.zeros(60), np.zeros(60),
                      np.round(np.linspace(0.0, -0.24, 60), 4)], -1)
    elif name == "circle":
        idx = np.arange(90)
        th = 2 * np.pi * idx / 45.0
        ph = 2 * np.pi * idx / 90.0
        t = np.stack([-0.04 * np.cos(th), -0.04 * np.sin(th),
                      0.09 * np.cos(ph)], -1)
    else:
        raise ValueError(name)
    R = np.tile(np.eye(3, dtype=np.float32), (len(t), 1, 1))
    return R, t.astype(np.float32)


def load_trajectory(traj_dir: str, name: str):
    """Returns (R (N,3,3), t (N,3)) float32."""
    npz_path = os.path.join(traj_dir, f"{name}.npz")
    if os.path.exists(npz_path):
        data = np.load(npz_path)
        return data["R"].astype(np.float32), data["t"].astype(np.float32)

    r_path = os.path.join(traj_dir, f"{name}_R_list")
    t_path = os.path.join(traj_dir, f"{name}_t_list")
    if os.path.exists(r_path) and os.path.exists(t_path):
        import torch
        R = torch.load(r_path, map_location="cpu")
        t = torch.load(t_path, map_location="cpu")
        return (np.stack([np.asarray(r) for r in R]).astype(np.float32),
                np.stack([np.asarray(x) for x in t]).astype(np.float32))

    return _procedural(name)


def convert_reference_trajectories(src_dir: str, dst_dir: str):
    """One-time conversion of the reference pickles to npz."""
    os.makedirs(dst_dir, exist_ok=True)
    for name in NAMES:
        R, t = load_trajectory(src_dir, name)
        np.savez(os.path.join(dst_dir, f"{name}.npz"), R=R, t=t)
