"""Bilinear 2D grid sampling (align_corners=True, border padding) — the XLA
gather equivalent of the torch F.grid_sample call in the reference HexPlane
(scene/hexplane.py:21-46).  Differentiable w.r.t. both grid and coords."""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """grid (C, H, W) features; coords (N, 2) in [-1, 1] with coords[:, 0]
    indexing W (x) and coords[:, 1] indexing H (y), exactly like
    F.grid_sample(align_corners=True, padding_mode='border').
    Returns (N, C)."""
    C, H, W = grid.shape
    x = (coords[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = x - x0
    wy = y - y0
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    g = grid.reshape(C, H * W)
    def take(yi, xi):
        return g[:, yi * W + xi].T            # (N, C)

    v00 = take(y0i, x0i)
    v01 = take(y0i, x1i)
    v10 = take(y1i, x0i)
    v11 = take(y1i, x1i)
    wx = wx[:, None]
    wy = wy[:, None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)
