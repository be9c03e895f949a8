"""Deformation field: HexPlane feature -> MLP heads -> (dx, ds, dr) plus the
linear scene-flow advection term.

Mirrors the reference deform_network / Deformation (scene/deformation.py):

- feature_out: Linear(feat_dim, W) then (D-1) x [ReLU, Linear(W, W)]
  (deformation.py:52-60; D = defor_depth, 0 for the demo config ->
  a single Linear with no activation)
- heads pos/scales/rotations (+opacity/shs, disabled by default via
  no_do/no_dshs=True, arguments/__init__.py:100-101):
  each Sequential(ReLU, Linear(W, W), ReLU, Linear(W, out))
  (deformation.py:61-65)
- dx = pos_deform(h) + delta_scale * frame_num * scene_flow
  (deformation.py:113-116); new position = xyz + dx (mask == 1)
- scales/rotations deformed additively (deformation.py:117-135)
- the timenet + positional-encoding buffers exist in the reference but are
  dead in the live path (deformation.py:204-210 comments them out); we keep
  timenet parameters for optimizer/checkpoint parity but never call it.

Parameters are a plain pytree; init mirrors initialize_weights
(deformation.py:229-235): xavier-uniform weights, torch-default uniform bias.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import grid
from . import hexplane
from .hexplane import HexPlaneConfig


class DeformConfig(NamedTuple):
    net_width: int = 64
    defor_depth: int = 0
    timebase_pe: int = 4
    timenet_width: int = 64
    timenet_output: int = 32
    grid: HexPlaneConfig = HexPlaneConfig()
    bounds: float = 1.6
    no_dx: bool = False
    no_ds: bool = False
    no_dr: bool = False
    no_do: bool = True
    no_dshs: bool = True
    apply_rotation: bool = False
    empty_voxel: bool = False
    static_mlp: bool = False


def _linear_init(key, in_dim, out_dim):
    """xavier_uniform weight (gain 1) + torch-default uniform bias."""
    wkey, bkey = jax.random.split(key)
    limit = float(np.sqrt(6.0 / (in_dim + out_dim)))
    W = jax.random.uniform(wkey, (in_dim, out_dim), jnp.float32, -limit, limit)
    blim = float(1.0 / np.sqrt(in_dim))
    b = jax.random.uniform(bkey, (out_dim,), jnp.float32, -blim, blim)
    return {"w": W, "b": b}


def _head_init(key, width, out_dim):
    k1, k2 = jax.random.split(key)
    return [_linear_init(k1, width, width), _linear_init(k2, width, out_dim)]


def init_deformation(key, config: DeformConfig) -> dict:
    feat_dim = config.grid.feat_dim
    W = config.net_width
    keys = jax.random.split(key, 16)
    feature_out = [_linear_init(keys[0], feat_dim, W)]
    for i in range(config.defor_depth - 1):
        feature_out.append(_linear_init(keys[1 + i], W, W))
    params = {
        "grid": hexplane.init_hexplane(keys[8], config.grid, config.bounds),
        "feature_out": feature_out,
        "pos_deform": _head_init(keys[9], W, 3),
        "scales_deform": _head_init(keys[10], W, 3),
        "rotations_deform": _head_init(keys[11], W, 4),
        "opacity_deform": _head_init(keys[12], W, 1),
        "shs_deform": _head_init(keys[13], W, 16 * 3),
        # dead in the live path; kept for checkpoint/optimizer parity
        "timenet": [_linear_init(keys[14], 2 * config.timebase_pe + 1,
                                 config.timenet_width),
                    _linear_init(keys[15], config.timenet_width,
                                 config.timenet_output)],
    }
    if config.empty_voxel:
        # DenseGrid alpha mask over the base parameters
        # (scene/deformation.py:30-31, 101-102)
        params["empty_voxel"] = grid.init_dense_grid(1, (64, 64, 64),
                                                     config.bounds)
    if config.static_mlp:
        # Sequential(ReLU, Linear, ReLU, Linear(W,1))
        # (scene/deformation.py:32-33, 99-100)
        params["static_mlp"] = _head_init(keys[7], W, 1)
    return params


def set_deform_aabb(params: dict, xyz_max, xyz_min) -> dict:
    """deform_network.set_aabb (scene/deformation.py:40-44): sets the
    HexPlane AABB and, when present, the empty-voxel grid's AABB."""
    params = dict(params)
    params["grid"] = hexplane.set_aabb(params["grid"], xyz_max, xyz_min)
    if "empty_voxel" in params:
        params["empty_voxel"] = grid.set_aabb(params["empty_voxel"],
                                              xyz_max, xyz_min)
    return params


def mlp_param_tree(params: dict) -> dict:
    """The 'deformation' optimizer group: every parameter whose torch name
    lacks 'grid' (gaussian_model.py:199, deformation.py:154-159) — the
    empty_voxel DenseGrid's parameter is named ``empty_voxel.grid`` so it
    lands in the grid group."""
    return {k: v for k, v in params.items()
            if k not in ("grid", "empty_voxel")}


def grid_param_tree(params: dict) -> dict:
    """The 'grid' optimizer group (gaussian_model.py:200)."""
    out = {"grid": params["grid"]}
    if "empty_voxel" in params:
        out["empty_voxel"] = params["empty_voxel"]
    return out


def _apply_linear(p, x):
    return x @ p["w"] + p["b"]


def _apply_head(head, h):
    """Sequential(ReLU, Linear, ReLU, Linear) (deformation.py:61-65)."""
    x = jax.nn.relu(h)
    x = _apply_linear(head[0], x)
    x = jax.nn.relu(x)
    return _apply_linear(head[1], x)


def _feature(params, config, pts, times, uniform_time=False):
    h = hexplane.hexplane_features(params["grid"], pts, times,
                                   uniform_time=uniform_time)
    for i, lin in enumerate(params["feature_out"]):
        if i > 0:
            h = jax.nn.relu(h)
        h = _apply_linear(lin, h)
    return h


def deform(params: dict, config: DeformConfig,
           means3d: jnp.ndarray, scales: jnp.ndarray, rotations: jnp.ndarray,
           opacity: jnp.ndarray, shs: jnp.ndarray,
           times: jnp.ndarray, scene_flow: jnp.ndarray,
           frame_num, delta_scale, uniform_time: bool = False):
    """Raw (pre-activation) parameters in, deformed raw parameters out,
    matching the reference call (gaussian_renderer/__init__.py:101-103 ->
    deformation.py:97-153).

    The mask multiplies the BASE parameter (not the delta):
    ``pts = xyz * mask + dx`` etc. (deformation.py:113-116, 119-124,
    141-143, 148-150); rotations never use the mask.  mask == 1 by default;
    static_mlp predicts it from the hexplane feature, empty_voxel samples a
    trainable DenseGrid at the undeformed position (deformation.py:99-104).

    ``uniform_time=True`` (every live render: one camera timestamp
    broadcast over the points) unlocks the MOM_TPU_TIME_MM temporal-plane
    matmul fast path — see hexplane.hexplane_features.

    Memory: above MOM_TPU_REMAT_DEFORM_AT points (default 1.5M) the whole
    deformation is wrapped in ``jax.checkpoint`` — the backward pass
    recomputes the hexplane features and MLP activations instead of
    holding ~20 (N, 32) f32 temps across the rasterizer (a 2.07M-point
    1080p scene OOMed a 16 GB v5e chip exactly here; scene_0's 921k stays
    below the threshold and pays no recompute).  Gradients are identical —
    remat changes scheduling, not math.  MOM_TPU_REMAT_DEFORM=1/0 forces
    it on/off."""
    def _impl(params, means3d, scales, rotations, opacity, shs, times,
              scene_flow, frame_num, delta_scale):
        h = _feature(params, config, means3d, times,
                     uniform_time=uniform_time)

        if config.static_mlp:
            mask = _apply_head(params["static_mlp"], h)      # (N, 1)
        elif config.empty_voxel:
            mask = grid.dense_grid_sample(params["empty_voxel"], means3d)
        else:
            mask = None                                      # identity

        def base(x):
            return x if mask is None else x * mask

        if config.no_dx:
            pts = means3d
        else:
            dx = _apply_head(params["pos_deform"], h)
            dx = dx + delta_scale * (frame_num * scene_flow)
            pts = base(means3d) + dx

        if config.no_ds:
            new_scales = scales
        else:
            new_scales = base(scales) + _apply_head(params["scales_deform"],
                                                    h)

        if config.no_dr:
            new_rot = rotations
        else:
            dr = _apply_head(params["rotations_deform"], h)
            if config.apply_rotation:
                new_rot = _quat_multiply(rotations, dr)
            else:
                new_rot = rotations + dr

        if config.no_do:
            new_opacity = opacity
        else:
            new_opacity = base(opacity) + _apply_head(
                params["opacity_deform"], h)

        if config.no_dshs:
            new_shs = shs
        else:
            dshs = _apply_head(params["shs_deform"], h).reshape(
                shs.shape[0], 16, 3)
            new_shs = (shs if mask is None else shs * mask[:, :, None]) + dshs

        return pts, new_scales, new_rot, new_opacity, new_shs

    forced = os.environ.get("MOM_TPU_REMAT_DEFORM")
    thresh = int(os.environ.get("MOM_TPU_REMAT_DEFORM_AT", "1500000") or 0)
    if not (forced == "1" or (forced != "0" and thresh
                              and means3d.shape[0] >= thresh)):
        return _impl(params, means3d, scales, rotations, opacity, shs,
                     times, scene_flow, frame_num, delta_scale)

    # CHUNKED remat: a single whole-N jax.checkpoint still OOMed — its
    # backward recomputes EVERY (N, 128)/(N, 64) hexplane/MLP temp at once
    # (six concurrent 1.24 GB buffers at 2.59M capacity).  The deformation
    # is pointwise, so lax.map over point chunks with a checkpointed body
    # bounds live temps to one chunk's worth (~67 MB at 128k), while
    # parameter gradients accumulate across chunks in the scan transpose.
    # Edge-padding (repeat of the last row) keeps the padded tail uniform
    # in time for the TIME_MM fast path; padded outputs are sliced off.
    n = means3d.shape[0]
    ch = int(os.environ.get("MOM_TPU_REMAT_DEFORM_CHUNK", "131072")
             or 131072)
    ch = min(ch, n)
    nc = -(-n // ch)
    pad = nc * ch - n

    def prep(a):
        if pad:
            a = jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], 0)
        return a.reshape((nc, ch) + a.shape[1:])

    xs = tuple(prep(a) for a in (means3d, scales, rotations, opacity, shs,
                                 times, scene_flow))
    body = jax.checkpoint(
        lambda t: _impl(params, *t, frame_num, delta_scale))
    outs = jax.lax.map(body, xs)
    return tuple(o.reshape((nc * ch,) + o.shape[2:])[:n] for o in outs)


def _quat_multiply(q1, q2):
    """batch_quaternion_multiply (utils/graphics_utils.py:109-132)."""
    w = q1[:, 0]*q2[:, 0] - q1[:, 1]*q2[:, 1] - q1[:, 2]*q2[:, 2] - q1[:, 3]*q2[:, 3]
    x = q1[:, 0]*q2[:, 1] + q1[:, 1]*q2[:, 0] + q1[:, 2]*q2[:, 3] - q1[:, 3]*q2[:, 2]
    y = q1[:, 0]*q2[:, 2] - q1[:, 1]*q2[:, 3] + q1[:, 2]*q2[:, 0] + q1[:, 3]*q2[:, 1]
    z = q1[:, 0]*q2[:, 3] + q1[:, 1]*q2[:, 2] - q1[:, 2]*q2[:, 1] + q1[:, 3]*q2[:, 0]
    q3 = jnp.stack([w, x, y, z], axis=1)
    return q3 / jnp.linalg.norm(q3, axis=1, keepdims=True)
