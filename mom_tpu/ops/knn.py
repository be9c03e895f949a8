"""Mean squared distance to the 3 nearest neighbors, used once at model init
to seed log-scales (TPU-native replacement for simple-knn's distCUDA2,
simple_knn.cu:147-183 / gaussian_model.py:164-165).

Two implementations:

- ``mean_3nn_sq_dist``: exact, chunked over both rows and columns so the
  distance matrix is never materialized.  Row blocks ride the MXU via
  ||x-y||^2 = ||x||^2 + ||y||^2 - 2 x.y.
- ``mean_3nn_sq_dist_morton``: approximate Morton-window version (sort by
  interleaved-bit code, exhaustive top-3 inside a +/-window) for very large
  clouds — mirrors the spirit of the reference's Morton box search
  (simple_knn.cu:45-117).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEIGHBORS = 3


@functools.partial(jax.jit, static_argnames=("row_block", "col_block"))
def mean_3nn_sq_dist(points: jnp.ndarray, row_block: int = 1024,
                     col_block: int = 16384) -> jnp.ndarray:
    """points (N, 3) -> (N,) mean of squared distances to the 3 NN (exact)."""
    N = points.shape[0]
    rb = min(row_block, N)
    cb = min(col_block, N)
    Nr = ((N + rb - 1) // rb) * rb
    Nc = ((N + cb - 1) // cb) * cb
    BIG = jnp.float32(3.4e38)

    pts_r = jnp.concatenate([points, jnp.full((Nr - N, 3), 1e18, points.dtype)])
    pts_c = jnp.concatenate([points, jnp.full((Nc - N, 3), 1e18, points.dtype)])
    sq_c = jnp.sum(pts_c * pts_c, axis=-1)

    row_ids = jnp.arange(Nr)
    col_ids = jnp.arange(Nc)

    def process_row_block(r):
        rows = jax.lax.dynamic_slice(pts_r, (r * rb, 0), (rb, 3))
        rid = jax.lax.dynamic_slice(row_ids, (r * rb,), (rb,))
        sq_r = jnp.sum(rows * rows, axis=-1)

        def col_step(c, best):
            cols = jax.lax.dynamic_slice(pts_c, (c * cb, 0), (cb, 3))
            cid = jax.lax.dynamic_slice(col_ids, (c * cb,), (cb,))
            d2 = (sq_r[:, None] + jnp.sum(cols * cols, -1)[None, :]
                  - 2.0 * rows @ cols.T)
            d2 = jnp.maximum(d2, 0.0)
            d2 = jnp.where(rid[:, None] == cid[None, :], BIG, d2)   # self
            d2 = jnp.where(cid[None, :] >= N, BIG, d2)              # padding
            # merge with running best-3: take top-3 of (best ++ chunk top-3)
            chunk_best = -jax.lax.top_k(-d2, NEIGHBORS)[0]
            merged = jnp.concatenate([best, chunk_best], axis=-1)
            return -jax.lax.top_k(-merged, NEIGHBORS)[0]

        best0 = jnp.full((rb, NEIGHBORS), BIG, points.dtype)
        best = jax.lax.fori_loop(0, Nc // cb, col_step, best0)
        return jnp.mean(best, axis=-1)

    out = jax.lax.map(process_row_block, jnp.arange(Nr // rb))
    return out.reshape(-1)[:N]


def _morton_codes(points: jnp.ndarray, bits: int = 10) -> jnp.ndarray:
    """Interleave-bit Morton codes over a normalized AABB; 10 bits per axis
    (30-bit code, fits uint32) like the reference (simple_knn.cu:45-70)."""
    mn = jnp.min(points, axis=0)
    mx = jnp.max(points, axis=0)
    q = ((points - mn) / jnp.maximum(mx - mn, 1e-9) * (2 ** bits - 1)).astype(jnp.uint32)

    def spread(v):
        out = jnp.zeros_like(v, dtype=jnp.uint32)
        for i in range(bits):
            out = out | (((v >> i) & 1) << (3 * i))
        return out

    return (spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2))


@functools.partial(jax.jit, static_argnames=("window",))
def mean_3nn_sq_dist_morton(points: jnp.ndarray, window: int = 24) -> jnp.ndarray:
    """Approximate 3-NN via a +/-window scan over Morton-sorted points."""
    N = points.shape[0]
    codes = _morton_codes(points)
    order = jnp.argsort(codes)
    sorted_pts = points[order]
    BIG = jnp.float32(3.4e38)

    best = jnp.full((N, NEIGHBORS), BIG, points.dtype)
    for shift in range(1, window + 1):
        for sgn in (1, -1):
            rolled = jnp.roll(sorted_pts, sgn * shift, axis=0)
            d2 = jnp.sum((sorted_pts - rolled) ** 2, axis=-1)
            idx = jnp.arange(N)
            oob = (idx - sgn * shift < 0) | (idx - sgn * shift >= N)
            d2 = jnp.where(oob, BIG, d2)
            merged = jnp.concatenate([best, d2[:, None]], axis=-1)
            best = -jax.lax.top_k(-merged, NEIGHBORS)[0]

    mean_sorted = jnp.mean(best, axis=-1)
    inv = jnp.zeros(N, jnp.int32).at[order].set(jnp.arange(N, dtype=jnp.int32))
    return mean_sorted[inv]
