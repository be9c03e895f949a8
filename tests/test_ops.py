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


# ---------------------------------------------------------------------------
# MXU scan/sort primitives (ops/scanprims.py) and the gated segment-sum VJPs


def test_blocked_cumsum_matches_cumsum():
    import jax
    from mom_tpu.ops.scanprims import blocked_cumsum
    rng = np.random.RandomState(3)
    for n, c in [(1024, 16), (2048, 128), (896, 8), (257, 4), (128, 4)]:
        x = jnp.asarray(rng.randn(n, c).astype(np.float32))
        got = np.asarray(jax.jit(blocked_cumsum)(x))
        ref = np.cumsum(np.asarray(x, np.float64), axis=0)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


def test_counting_argsort_matches_lax_sort():
    import jax
    from mom_tpu.ops.scanprims import counting_argsort
    rng = np.random.RandomState(4)
    for n, n_vals in [(1024, 100), (1000, 128), (4096, 4096),
                      (777, 16384), (512, 1)]:
        idx = jnp.asarray(rng.randint(0, n_vals, n).astype(np.int32))
        got = np.asarray(jax.jit(
            lambda i: counting_argsort(i, n_vals))(idx))
        ref = np.asarray(jax.lax.sort(
            (idx, jax.lax.iota(jnp.int32, n)), num_keys=1)[1])
        np.testing.assert_array_equal(got, ref)


def test_patch_gather_vjp_gates_match_default(monkeypatch):
    """MOM_TPU_SEG_RADIX / MOM_TPU_BLOCK_CUMSUM must reproduce the default
    patch-gather gradient (the hexplane backward hot path)."""
    import jax
    from mom_tpu.ops.gridsample import (build_patch_table,
                                        grid_sample_2d_patched)
    rng = np.random.RandomState(5)
    C, H, W = 8, 17, 13
    grid = jnp.asarray(rng.randn(C, H, W).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.1, 1.1, (640, 2)).astype(np.float32))

    def loss(g, c):
        pt = build_patch_table(g)
        out = grid_sample_2d_patched(pt, H, W, c)
        return jnp.sum(out * jnp.cos(out))

    # gates are DEFAULT ON since the round-5 hardware sweep: pin the
    # reference side to the sort/cumsum path explicitly
    monkeypatch.setenv("MOM_TPU_SEG_RADIX", "0")
    monkeypatch.setenv("MOM_TPU_BLOCK_CUMSUM", "0")
    ref = jax.grad(loss, argnums=(0, 1))(grid, coords)
    monkeypatch.setenv("MOM_TPU_SEG_RADIX", "1")
    monkeypatch.setenv("MOM_TPU_BLOCK_CUMSUM", "1")
    got = jax.grad(loss, argnums=(0, 1))(grid, coords)
    for g, r in zip(got, ref):
        # both paths compute segment sums as prefix differences; the blocked
        # path reassociates the fp32 summation, so agreement is bounded by
        # cancellation at ~eps * |prefix|, not exact
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=3e-4, rtol=1e-4)


def test_expand_rows_bwd_block_cumsum_matches(monkeypatch):
    """The rasterizer's instance-gradient segment sum under
    MOM_TPU_BLOCK_CUMSUM matches the jnp.cumsum path."""
    import jax
    from mom_tpu.ops import rasterize as R

    rng = np.random.RandomState(6)
    P, key_cap = 40, 512
    table = jnp.asarray(rng.randn(P, R.NFEAT).astype(np.float32))
    areas = rng.randint(0, 30, P).astype(np.int32)
    offs = np.concatenate([[0], np.cumsum(areas)[:-1]]).astype(np.int32)
    total = int(areas.sum())
    # identity ranked->padded layout with some pad slots interleaved
    gid = np.repeat(np.arange(P, dtype=np.int32), areas)
    pcap = 768
    origin = np.full(pcap, key_cap, np.int32)
    origin[:total] = np.arange(total, dtype=np.int32)
    gidp = np.zeros(pcap, np.int32)
    gidp[:total] = gid

    def f(t):
        return R._expand_rows(key_cap, t, jnp.asarray(gidp),
                              jnp.asarray(origin), jnp.asarray(offs),
                              jnp.asarray(areas))

    ct = jnp.asarray(rng.randn(R.NFEAT, pcap).astype(np.float32))
    monkeypatch.setenv("MOM_TPU_BLOCK_CUMSUM", "0")   # default flipped on
    ref = jax.vjp(f, table)[1](ct)[0]
    monkeypatch.setenv("MOM_TPU_BLOCK_CUMSUM", "1")
    got = jax.vjp(f, table)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_hexplane_time_matmul_matches_patch_path(monkeypatch):
    """MOM_TPU_TIME_MM (uniform-time temporal-plane matmul) must match the
    patch-gather path on features AND gradients."""
    import jax
    from mom_tpu.models import hexplane as HX
    cfg = HX.HexPlaneConfig(out_dim=8, resolution=(16, 16, 16, 7),
                            multires=(1, 2))
    params = HX.init_hexplane(jax.random.PRNGKey(0), cfg, bounds=1.3)
    # give time planes non-trivial content (they init to ones)
    params["grids"] = [
        [p + 0.3 * jnp.sin(jnp.arange(p.size, dtype=jnp.float32)
                           ).reshape(p.shape) for p in scale]
        for scale in params["grids"]]
    rng = np.random.RandomState(7)
    pts = jnp.asarray(rng.uniform(-1.2, 1.2, (384, 3)).astype(np.float32))
    times = jnp.broadcast_to(jnp.float32(0.37), (384,))

    def loss(p, x, t):
        f = HX.hexplane_features(p, x, t, uniform_time=True)
        return jnp.sum(jnp.sin(f)), f

    monkeypatch.setenv("MOM_TPU_TIME_MM", "0")        # default flipped on
    (l0, f0), g0 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        params, pts, times)
    monkeypatch.setenv("MOM_TPU_TIME_MM", "1")
    (l1, f1), g1 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        params, pts, times)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               atol=2e-5, rtol=2e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)
