"""Bilinear 2D grid sampling (align_corners=True, border padding) — the XLA
gather equivalent of the torch F.grid_sample call in the reference HexPlane
(scene/hexplane.py:21-46).  Differentiable w.r.t. both grid and coords.

Two sampling paths:

- grid_sample_2d: 4 corner-row gathers from a (H*W, C) table.  On TPU each
  gathered row reads its full (8, 128) memory tile, so a C=32 row costs a
  4 KB read — 16 KB per point per plane.
- grid_sample_2d_patched (the hexplane hot path): gathers ONE row from a
  precomputed (H*W, 4*C) 2x2-PATCH table whose row (y, x) holds the four
  bilinear corners [T(y,x), T(y,x+1), T(y+1,x), T(y+1,x+1)].  With C=32 a
  patch row is exactly 128 lanes, so the same sample costs one aligned
  4 KB read — 4x less gather traffic forward, and the VJP does one
  scatter-add instead of four.  Border clamping is baked in by
  edge-padding the grid before patch extraction."""

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


def build_patch_table(grid: jnp.ndarray) -> jnp.ndarray:
    """grid (C, H, W) -> (H*W, 4*C) table of 2x2 bilinear patches.
    Row y*W+x = [T(y,x), T(y,x+1), T(y+1,x), T(y+1,x+1)] with edge
    replication, which reproduces padding_mode='border' corner clamping
    (x1 = min(x0+1, W-1) reads the same value as the replicated edge)."""
    C, H, W = grid.shape
    g = jnp.pad(grid, ((0, 0), (0, 1), (0, 1)), mode="edge")   # (C, H+1, W+1)
    p00 = g[:, :H, :W]
    p01 = g[:, :H, 1:W + 1]
    p10 = g[:, 1:H + 1, :W]
    p11 = g[:, 1:H + 1, 1:W + 1]
    # (H, W, 4C) -> (H*W, 4C): corner-major then channel, so the sample can
    # slice [0:C], [C:2C], ...
    patches = jnp.concatenate(
        [p.transpose(1, 2, 0) for p in (p00, p01, p10, p11)], axis=-1)
    return patches.reshape(H * W, 4 * C)


def grid_sample_2d_patched(patches: jnp.ndarray, H: int, W: int,
                           coords: jnp.ndarray) -> jnp.ndarray:
    """Sample from a build_patch_table output; same semantics as
    grid_sample_2d(grid, coords).  patches (H*W, 4C), coords (N, 2) in
    [-1, 1] -> (N, C)."""
    C4 = patches.shape[1]
    C = C4 // 4
    x = (coords[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    idx = y0.astype(jnp.int32) * W + x0.astype(jnp.int32)
    rows = _patch_gather(patches, idx)                         # (N, 4C)
    v00 = rows[:, 0 * C:1 * C]
    v01 = rows[:, 1 * C:2 * C]
    v10 = rows[:, 2 * C:3 * C]
    v11 = rows[:, 3 * C:4 * C]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


# ---------------------------------------------------------------------------
# sorted-segment-sum VJP for the patch gather
#
# The autodiff VJP of rows = patches[idx] is an XLA scatter-add with ~N/cells
# duplicate indices (70x collisions at 1M points over a 128^2 plane) — a
# notoriously serialized path on TPU.  _patch_gather replaces it with
# throughput-bound primitives: sort the indices, reorder the cotangent rows,
# one cumsum, and two boundary gathers (same trick as the rasterizer's
# _expand_rows_bwd).

import functools as _functools

import jax as _jax


@_functools.partial(_jax.custom_vjp, nondiff_argnums=())
def _patch_gather(patches, idx):
    return patches[idx]


def _patch_gather_fwd(patches, idx):
    return patches[idx], (idx, patches.shape[0])


def _patch_gather_bwd(res, g_rows):
    idx, n_cells = res
    n = idx.shape[0]
    import os as _os
    if _os.environ.get("MOM_TPU_SEG_RADIX", "1") != "0":  # default on (+7.3%
        # bwd-gate set, runlogs/gate_sweep_r5.json); =0 restores lax.sort
        # 2-pass MXU counting argsort over the <=16k-cell id domain instead
        # of an O(n log^2 n) comparison network (scanprims.py)
        from .scanprims import counting_argsort
        order = counting_argsort(idx, n_cells)
    else:
        order = _jax.lax.sort((idx, _jax.lax.iota(jnp.int32, n)),
                              num_keys=1)[1]
    g_sorted = jnp.take(g_rows, order, axis=0)
    idx_sorted = jnp.take(idx, order)
    if _os.environ.get("MOM_TPU_BLOCK_CUMSUM", "1") != "0":  # default on
        from .scanprims import blocked_cumsum
        inc = blocked_cumsum(g_sorted)
    else:
        inc = jnp.cumsum(g_sorted, axis=0)
    csum = jnp.concatenate(
        [jnp.zeros((1, g_rows.shape[1]), g_rows.dtype), inc], axis=0)
    cells = jnp.arange(n_cells, dtype=jnp.int32)
    starts = jnp.searchsorted(idx_sorted, cells, side="left")
    ends = jnp.searchsorted(idx_sorted, cells + 1, side="left")
    d_patches = jnp.take(csum, ends, axis=0) - jnp.take(csum, starts, axis=0)
    return d_patches, None


_patch_gather.defvjp(_patch_gather_fwd, _patch_gather_bwd)
