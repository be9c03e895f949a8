"""Synthetic camera pose seeds for point-cloud multi-view rendering.

Pose parameterization matches the reference (utils/trajectory.py): each pose
is a (3,4) world-to-camera [R|t] built from a yaw (th, around +y) and pitch
(phi, around +x) pair, R = Ry(th) @ Rx(phi).  The live path uses
'lookaround' (= 5-pose preset, trajectory.py:210-226) and 'hemisphere'
(5 poses around a d=4.3 pivot, trajectory.py:282-300)."""

from __future__ import annotations

import numpy as np


def _rot_yx(th_deg: float, phi_deg: float) -> np.ndarray:
    th = th_deg / 180 * np.pi
    phi = phi_deg / 180 * np.pi
    Ry = np.array([[np.cos(th), 0, -np.sin(th)],
                   [0, 1, 0],
                   [np.sin(th), 0, np.cos(th)]])
    Rx = np.array([[1, 0, 0],
                   [0, np.cos(phi), -np.sin(phi)],
                   [0, np.sin(phi), np.cos(phi)]])
    return Ry @ Rx


def _lookaround_angles():
    degsum = 60
    thlist = np.concatenate((np.linspace(0, degsum, 4), np.linspace(0, -degsum, 4)[1:],
                             np.linspace(0, degsum, 4), np.linspace(0, -degsum, 4)[1:],
                             np.linspace(0, degsum, 4), np.linspace(0, -degsum, 4)[1:]))
    philist = np.concatenate((np.linspace(0, 0, 7), np.linspace(-22.5, -22.5, 7),
                              np.linspace(22.5, 22.5, 7)))
    return thlist, philist


def generate_seed_preset() -> np.ndarray:
    """5 'lookaround' poses — indices [0,1,4,7,14] of the 21-angle grid."""
    thlist, philist = _lookaround_angles()
    picks = [0, 1, 4, 7, 14]
    poses = np.zeros((len(picks), 3, 4))
    for i, p in enumerate(picks):
        poses[i, :3, :3] = _rot_yx(thlist[p], philist[p])
    return poses


def generate_seed_lookaround() -> np.ndarray:
    """All 21 lookaround poses (trajectory.py:193-208)."""
    thlist, philist = _lookaround_angles()
    poses = np.zeros((len(thlist), 3, 4))
    for i in range(len(thlist)):
        poses[i, :3, :3] = _rot_yx(thlist[i], philist[i])
    return poses


def generate_seed_hemisphere(center_depth: float = 4.3) -> np.ndarray:
    """5 small-angle poses orbiting a pivot at distance d=4.3 in front of the
    camera.  NOTE: the reference ignores its ``center_depth`` argument and
    hard-codes d=4.3 (trajectory.py:294); we keep that behavior as default."""
    degree = 5
    d = 4.3
    thlist = np.array([degree, 0, 0, 0, -degree])
    philist = np.array([0, -degree, 0, degree, 0])
    poses = np.zeros((len(thlist), 3, 4))
    for i in range(len(thlist)):
        th, phi = thlist[i], philist[i]
        poses[i, :3, :3] = _rot_yx(th, phi)
        t = (np.array([d * np.sin(th / 180 * np.pi), 0, d - d * np.cos(th / 180 * np.pi)])
             + np.array([0, d * np.sin(phi / 180 * np.pi), d - d * np.cos(phi / 180 * np.pi)]))
        poses[i, :3, 3] = t
    return poses


def generate_seed_newpreset() -> np.ndarray:
    degsum = 60
    thlist = np.concatenate((np.linspace(0, degsum, 4), np.linspace(0, -degsum, 4)[1:],
                             np.linspace(0, degsum, 4), np.linspace(0, -degsum, 4)[1:]))
    philist = np.concatenate((np.linspace(0, 0, 7), np.linspace(22.5, 22.5, 7)))
    poses = np.zeros((len(thlist), 3, 4))
    for i in range(len(thlist)):
        poses[i, :3, :3] = _rot_yx(thlist[i], philist[i])
    return poses


def generate_seed_horizon() -> np.ndarray:
    movement = np.linspace(0, 5, 11)
    poses = np.zeros((len(movement), 3, 4))
    for i, m in enumerate(movement):
        poses[i, :3, :3] = np.eye(3)
        poses[i, :3, 3] = [-m, 0, 0]
    return poses


def generate_seed_backward() -> np.ndarray:
    movement = np.linspace(0, 5, 11)
    poses = np.zeros((len(movement), 3, 4))
    for i, m in enumerate(movement):
        poses[i, :3, :3] = np.eye(3)
        poses[i, :3, 3] = [0, 0, m]
    return poses


def generate_seed_360(viewangle: int = 360, nviews: int = 10) -> np.ndarray:
    N = nviews + 1 if viewangle == 360 else nviews
    thlist = np.linspace(0, viewangle, N)
    poses = np.zeros((len(thlist), 3, 4))
    for i in range(len(thlist)):
        poses[i, :3, :3] = _rot_yx(thlist[i], 0)
    return poses


def get_pcd_gen_poses(pcdgenpath: str, argdict: dict | None = None) -> np.ndarray:
    """Pose-seed dispatch mirroring get_pcdGenPoses (trajectory.py:500-519)."""
    argdict = argdict or {}
    if pcdgenpath == "rotate360":
        return generate_seed_360(360, 10)
    if pcdgenpath == "lookaround":
        return generate_seed_preset()
    if pcdgenpath == "moveright":
        return generate_seed_horizon()
    if pcdgenpath == "moveback":
        return generate_seed_backward()
    if pcdgenpath == "lookdown":
        return generate_seed_newpreset()
    if pcdgenpath == "hemisphere":
        return generate_seed_hemisphere(argdict.get("center_depth", 4.3))
    raise ValueError(f"Invalid pcdgenpath: {pcdgenpath}")
