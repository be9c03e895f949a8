"""DenseGrid — 3D dense voxel grid with trilinear sampling (reference
scene/grid.py:15-57; live only when hidden.empty_voxel=True, off by
default)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_dense_grid(channels: int = 1, world_size=(64, 64, 64),
                    bounds: float = 1.6) -> dict:
    return {
        # ones-initialized like the reference (scene/grid.py:24), so the
        # empty_voxel mask starts at 1.0 everywhere
        "grid": jnp.ones((channels,) + tuple(world_size), jnp.float32),
        "xyz_max": jnp.full(3, bounds, jnp.float32),
        "xyz_min": jnp.full(3, -bounds, jnp.float32),
    }


def set_aabb(params: dict, xyz_max, xyz_min) -> dict:
    return {**params, "xyz_max": jnp.asarray(xyz_max, jnp.float32),
            "xyz_min": jnp.asarray(xyz_min, jnp.float32)}


def dense_grid_sample(params: dict, pts: jnp.ndarray) -> jnp.ndarray:
    """pts (N, 3) world -> (N, C) trilinear samples.

    Matches torch F.grid_sample(align_corners=True) with the DEFAULT zeros
    padding used by the reference forward (scene/grid.py:33): out-of-AABB
    samples fade to 0.  Implemented by sampling a zero-padded grid with
    coordinates shifted by one voxel."""
    grid = params["grid"]                      # (C, X, Y, Z)
    C, X, Y, Z = grid.shape
    n = (pts - params["xyz_min"]) / (params["xyz_max"] - params["xyz_min"])
    coords = n * jnp.array([X - 1, Y - 1, Z - 1], jnp.float32)
    c0f = jnp.floor(coords)
    f = coords - c0f
    # indices into the zero-padded grid; clamping lands far-out-of-range
    # samples entirely inside the zero border
    c0 = jnp.clip(c0f.astype(jnp.int32) + 1, 0,
                  jnp.array([X + 1, Y + 1, Z + 1]))
    c1 = jnp.clip(c0f.astype(jnp.int32) + 2, 0,
                  jnp.array([X + 1, Y + 1, Z + 1]))

    padded = jnp.pad(grid, ((0, 0), (1, 1), (1, 1), (1, 1)))
    g = padded.reshape(C, -1)
    Yp, Zp = Y + 2, Z + 2

    def take(ix, iy, iz):
        return g[:, (ix * Yp + iy) * Zp + iz].T    # (N, C)

    out = 0.0
    for dx, wx in ((0, 1 - f[:, 0]), (1, f[:, 0])):
        for dy, wy in ((0, 1 - f[:, 1]), (1, f[:, 1])):
            for dz, wz in ((0, 1 - f[:, 2]), (1, f[:, 2])):
                ix = c1[:, 0] if dx else c0[:, 0]
                iy = c1[:, 1] if dy else c0[:, 1]
                iz = c1[:, 2] if dz else c0[:, 2]
                out = out + (wx * wy * wz)[:, None] * take(ix, iy, iz)
    return out
