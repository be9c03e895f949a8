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

    # row-major table so each corner lookup is ONE contiguous row gather of
    # C floats: gathering columns of a (C, H*W) table at millions of indices
    # is HBM-latency bound on TPU (~10x slower; same lesson as the packed
    # row gather in ops/rasterize.py).  The (H*W, C) transpose itself is a
    # tiny one-shot relayout of the <=16k-cell plane.
    g = grid.reshape(C, H * W).T              # (H*W, C)

    def take(yi, xi):
        return g[yi * W + xi]                 # (N, C) row gather

    v00 = take(y0i, x0i)
    v01 = take(y0i, x1i)
    v10 = take(y1i, x0i)
    v11 = take(y1i, x1i)
    wx = wx[:, None]
    wy = wy[:, None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)
