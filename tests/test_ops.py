"""Tests for KNN init and bilinear grid sampling."""

import numpy as np
import jax.numpy as jnp
import pytest

from mom_tpu.ops.knn import mean_3nn_sq_dist, mean_3nn_sq_dist_morton
from mom_tpu.ops.gridsample import grid_sample_2d


def brute_force_3nn(points):
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    d2.sort(axis=1)
    return d2[:, :3].mean(axis=1)


def test_knn_exact_matches_bruteforce():
    rng = np.random.RandomState(0)
    pts = rng.randn(257, 3).astype(np.float32)  # non-multiple of block
    got = np.asarray(mean_3nn_sq_dist(jnp.asarray(pts), row_block=64,
                                      col_block=128))
    expect = brute_force_3nn(pts.astype(np.float64))
    np.testing.assert_allclose(got, expect, rtol=2e-3)


def test_knn_morton_close_to_exact():
    rng = np.random.RandomState(1)
    pts = rng.rand(2000, 3).astype(np.float32)
    exact = np.asarray(mean_3nn_sq_dist(jnp.asarray(pts)))
    approx = np.asarray(mean_3nn_sq_dist_morton(jnp.asarray(pts), window=32))
    # approximate distances can only overestimate; most should be near-exact
    assert np.all(approx >= exact - 1e-6)
    rel = (approx - exact) / np.maximum(exact, 1e-12)
    assert np.median(rel) < 0.05
    # log-scale seeds only need coarse agreement
    assert np.mean(np.abs(np.log(np.maximum(approx, 1e-12))
                          - np.log(np.maximum(exact, 1e-12)))) < 0.5


def test_grid_sample_matches_torch_semantics():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(2)
    grid = rng.randn(8, 5, 7).astype(np.float32)    # (C, H, W)
    coords = rng.uniform(-1.3, 1.3, (40, 2)).astype(np.float32)  # incl. border
    got = np.asarray(grid_sample_2d(jnp.asarray(grid), jnp.asarray(coords)))
    t = F.grid_sample(torch.tensor(grid)[None],
                      torch.tensor(coords)[None, None],
                      align_corners=True, mode="bilinear",
                      padding_mode="border")
    expect = t[0, :, 0, :].T.numpy()
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_grid_sample_exact_corners():
    grid = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4)
    # (-1,-1) -> (x=0, y=0) -> value 0 ; (1,1) -> (x=3,y=2) -> value 11
    out = grid_sample_2d(grid, jnp.array([[-1.0, -1.0], [1.0, 1.0]]))
    assert float(out[0, 0]) == 0.0
    assert float(out[1, 0]) == 11.0


def test_dense_grid_trilinear():
    from mom_tpu.models.grid import init_dense_grid, dense_grid_sample
    import jax.numpy as jnp
    p = init_dense_grid(channels=2, world_size=(4, 4, 4), bounds=1.0)
    g = np.zeros((2, 4, 4, 4), np.float32)
    g[0] = np.arange(64).reshape(4, 4, 4)
    p["grid"] = jnp.asarray(g)
    # corner samples hit grid values exactly
    out = dense_grid_sample(p, jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]))
    assert float(out[0, 0]) == 0.0
    assert float(out[1, 0]) == 63.0
    # midpoint interpolates
    mid = dense_grid_sample(p, jnp.array([[0.0, 0.0, 0.0]]))
    assert 0 < float(mid[0, 0]) < 63


@pytest.mark.parity
def test_grid_sample_patched_matches_plain():
    """The 2x2-patch-table sampling path (one 128-lane row gather) must be
    numerically identical to the 4-corner-gather path, including border
    clamping at the edges."""
    import jax.numpy as jnp
    from mom_tpu.ops.gridsample import (grid_sample_2d, build_patch_table,
                                        grid_sample_2d_patched)
    rng = np.random.RandomState(3)
    C, H, W = 32, 13, 17
    grid = jnp.asarray(rng.randn(C, H, W).astype(np.float32))
    # include exact corners/edges and out-of-range coords (border clamp)
    coords = np.concatenate([
        rng.uniform(-1, 1, (500, 2)),
        np.array([[-1, -1], [1, 1], [-1, 1], [1, -1], [0, 1], [1, 0],
                  [-1.7, 0.3], [0.2, 2.5]])]).astype(np.float32)
    a = grid_sample_2d(grid, jnp.asarray(coords))
    b = grid_sample_2d_patched(build_patch_table(grid), H, W,
                               jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # gradients w.r.t. the grid agree too (the patch-table VJP folds the
    # patch scatter back onto the plane)
    import jax
    ga = jax.grad(lambda g: jnp.sum(jnp.sin(
        grid_sample_2d(g, jnp.asarray(coords)))))(grid)
    gb = jax.grad(lambda g: jnp.sum(jnp.sin(grid_sample_2d_patched(
        build_patch_table(g), H, W, jnp.asarray(coords)))))(grid)
    # the sorted-segment-sum VJP accumulates per-cell contributions in
    # index order, not scatter order: pure fp32 reordering noise
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-4)
