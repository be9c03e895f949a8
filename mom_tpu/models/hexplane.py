"""HexPlane 4D feature field as a pure functional pytree.

Mirrors the reference HexPlaneField (scene/hexplane.py:109-183):

- 6 planes per scale from itertools.combinations(range(4), 2):
  (x,y) (x,z) (x,t) (y,z) (y,t) (z,t) — indices 0..5; spatial = {0,1,3},
  temporal = {2,4,5}
- multiscale resolution multipliers applied to the *spatial* axes only
  (hexplane.py:130-134)
- spatial planes init U(0.1, 0.5); time planes init to ones (hexplane.py:64-67)
- per-plane bilinear sample (align_corners, border), product over the 6
  planes, concat over scales (hexplane.py:86-106)
- inputs normalized to [-1, 1] by an AABB (hexplane.py:19-20); time is
  expected in [0, 1] and also passes through the same affine map with
  aabb [0,1] -> handled by storing a 4D aabb.
"""

from __future__ import annotations

import itertools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gridsample import (grid_sample_2d, build_patch_table,
                              grid_sample_2d_patched)

COO_COMBS = list(itertools.combinations(range(4), 2))
SPATIAL_PLANES = (0, 1, 3)
TIME_PLANES = (2, 4, 5)


class HexPlaneConfig(NamedTuple):
    out_dim: int = 32
    resolution: tuple = (64, 64, 64, 25)
    multires: tuple = (1, 2)

    @property
    def feat_dim(self) -> int:
        return self.out_dim * len(self.multires)


def init_hexplane(key, config: HexPlaneConfig, bounds: float = 1.6) -> dict:
    """Returns {'grids': [[plane(out_dim, r_b, r_a)]*6 per scale],
    'aabb': (2, 3)}.  Plane for combination (a, b) has shape
    [out_dim, reso[b], reso[a]] (reference reverses the combo,
    hexplane.py:61-63, so grid_sample x-axis indexes coordinate a)."""
    grids = []
    for res_mult in config.multires:
        reso = [r * res_mult for r in config.resolution[:3]] + list(config.resolution[3:])
        scale_planes = []
        for ci, (a, b) in enumerate(COO_COMBS):
            shape = (config.out_dim, reso[b], reso[a])
            key, sub = jax.random.split(key)
            if 3 in (a, b):   # time plane -> ones
                plane = jnp.ones(shape, jnp.float32)
            else:
                plane = jax.random.uniform(sub, shape, jnp.float32, 0.1, 0.5)
            scale_planes.append(plane)
        grids.append(scale_planes)
    aabb = jnp.array([[bounds] * 3, [-bounds] * 3], jnp.float32)
    return {"grids": grids, "aabb": aabb}


def set_aabb(params: dict, xyz_max, xyz_min) -> dict:
    aabb = jnp.array([np.asarray(xyz_max), np.asarray(xyz_min)], jnp.float32)
    return {**params, "aabb": aabb}


def _time_plane_sample_mm(plane: jnp.ndarray, xcoord: jnp.ndarray,
                          t_raw: jnp.ndarray) -> jnp.ndarray:
    """Uniform-time sample of a temporal plane as slice + MXU matmul.

    Every live render evaluates the deformation at ONE timestamp
    (render.py:55 broadcasts the camera time), so a temporal plane
    (C, T, S) reduces to a (C, S) t-slice (two-row lerp) and the per-point
    spatial lerp becomes a hat-weight matmul: relu(1 - |x - s|) is exactly
    the bilinear weight row (two nonzeros, border-clamped).  This replaces
    a latency-bound 2D patch gather per point with streaming MXU work —
    and its VJP is two matmuls instead of a sort + segment-sum
    (gridsample._patch_gather_bwd).  Bit-compatible with the patch path up
    to fp32 contraction order."""
    C, T, S = plane.shape
    ty = jnp.clip((t_raw + 1.0) * 0.5 * (T - 1), 0.0, T - 1)
    tf = jnp.floor(ty)
    wt = ty - tf
    t0 = tf.astype(jnp.int32)
    t1 = jnp.minimum(t0 + 1, T - 1)
    row = (1.0 - wt) * plane[:, t0, :] + wt * plane[:, t1, :]    # (C, S)
    x = jnp.clip((xcoord + 1.0) * 0.5 * (S - 1), 0.0, S - 1)     # (N,)
    hat = jax.nn.relu(1.0 - jnp.abs(
        x[:, None] - jax.lax.iota(jnp.float32, S)[None, :]))     # (N, S)
    return jax.lax.dot_general(hat, row, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def hexplane_features(params: dict, pts: jnp.ndarray,
                      times: jnp.ndarray,
                      uniform_time: bool = False) -> jnp.ndarray:
    """pts (N, 3) world coords, times (N,) in [0, 1] -> (N, feat_dim).

    normalize_aabb (hexplane.py:19-20): x_norm = (x - aabb[0]) * 2 /
    (aabb[1] - aabb[0]) - 1 where aabb[0] is the MAX row (reference stores
    [max, min], scene/hexplane.py:152-157 — so max maps to -1, min to +1).

    QUIRK PRESERVED: the reference concatenates the raw time in [0, 1]
    *without* remapping to [-1, 1] (hexplane.py:163-164), so the time axis of
    the temporal planes only uses its upper half.  We reproduce that.

    ``uniform_time=True`` asserts every entry of ``times`` equals
    ``times[0]`` (true for all live renders — render.py:55 broadcasts the
    camera time).  With MOM_TPU_TIME_MM=1 the temporal planes then sample
    via a t-slice + hat-weight MXU matmul instead of per-point patch
    gathers (see _time_plane_sample_mm)."""
    aabb = params["aabb"]
    pts_n = (pts - aabb[0]) * (2.0 / (aabb[1] - aabb[0])) - 1.0
    coords4 = jnp.concatenate([pts_n, times[:, None]], axis=-1)   # (N, 4)
    # default on: part of the bwd-gate set the first hardware sweep measured
    # at +7.3% (runlogs/gate_sweep_r5.json); MOM_TPU_TIME_MM=0 restores the
    # patch-gather path
    time_mm = uniform_time and os.environ.get("MOM_TPU_TIME_MM", "1") != "0"

    features = []
    for scale_planes in params["grids"]:
        interp = 1.0
        for ci, (a, b) in enumerate(COO_COMBS):
            plane = scale_planes[ci]
            if time_mm and b == 3:
                interp = interp * _time_plane_sample_mm(
                    plane, coords4[:, a], times[0])
                continue
            c2 = jnp.stack([coords4[:, a], coords4[:, b]], axis=-1)
            # patch-table path: one aligned 128-lane row gather per sample
            # instead of four 32-lane corner gathers (4x less TPU gather
            # traffic at 1M+ points; see ops/gridsample.py docstring)
            _, ph, pw = plane.shape
            interp = interp * grid_sample_2d_patched(
                build_patch_table(plane), ph, pw, c2)
        features.append(interp)
    return jnp.concatenate(features, axis=-1)


def plane_smoothness(plane: jnp.ndarray) -> jnp.ndarray:
    """Second-difference smoothness along the H (second-to-last) axis —
    reference compute_plane_smoothness (scene/regulation.py:22-28)."""
    first = plane[..., 1:, :] - plane[..., :-1, :]
    second = first[..., 1:, :] - first[..., :-1, :]
    return jnp.mean(jnp.square(second))


def grid_regularization(params: dict, time_smoothness_weight: float,
                        l1_time_planes_weight: float,
                        plane_tv_weight: float) -> jnp.ndarray:
    """compute_regulation (gaussian_model.py:730-769): 'plane tv' =
    smoothness over spatial planes, time smoothness + L1-to-1 over temporal
    planes."""
    plane_total = 0.0
    time_total = 0.0
    l1_total = 0.0
    for scale_planes in params["grids"]:
        for gid in SPATIAL_PLANES:
            plane_total = plane_total + plane_smoothness(scale_planes[gid])
        for gid in TIME_PLANES:
            time_total = time_total + plane_smoothness(scale_planes[gid])
            l1_total = l1_total + jnp.mean(jnp.abs(1.0 - scale_planes[gid]))
    return (plane_tv_weight * plane_total
            + time_smoothness_weight * time_total
            + l1_time_planes_weight * l1_total)
