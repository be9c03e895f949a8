"""Data-parallel training over the 8 virtual CPU devices: the sharded step
must run, improve the loss, and agree with an equivalent single-device
batched computation on the gradients' effect."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from mom_tpu import config as C
from mom_tpu.cameras import Camera, pack_cameras
from mom_tpu.parallel.data_parallel import make_mesh, make_dp_train_step
from tests.test_training import _toy_state


def _cams_and_gts(n, W, H, state, dcfg, seed=3):
    from mom_tpu.render import render as render_fn
    rng = np.random.RandomState(seed)
    cams = []
    for i in range(n):
        th = (i - n / 2) * 0.05
        R = np.array([[np.cos(th), 0, -np.sin(th)], [0, 1, 0],
                      [np.sin(th), 0, np.cos(th)]])
        cams.append(Camera(R=R, T=rng.randn(3) * 0.01, fovx=0.8, fovy=0.8,
                           width=W, height=H, time=0.0, frame_num=0))
    packed = pack_cameras(cams)
    gts = []
    for i in range(n):
        cam_i = {k: jnp.asarray(v[i]) for k, v in packed.items()}
        out = render_fn(state.gauss.params, state.gauss.aux, state.deform,
                        dcfg, cam_i, W, H, jnp.zeros(3), stage="coarse",
                        active_sh_degree=0, backend="reference")
        gts.append(np.asarray(jnp.clip(out.color, 0, 1)))
    return packed, (np.stack(gts) * 255).astype(np.uint8)


@pytest.mark.parity
def test_dp_step_runs_and_learns():
    assert len(jax.devices()) == 8
    state, dcfg = _toy_state(n=64, capacity=128)
    W = H = 32
    opt = C.OptimizationParams()
    hidden = C.ModelHiddenParams()
    packed, gts = _cams_and_gts(8, W, H, state, dcfg)

    # perturb so there's signal
    key = jax.random.PRNGKey(0)
    pert = state.gauss.params._replace(
        features_dc=state.gauss.params.features_dc
        + 0.3 * jax.random.normal(key, state.gauss.params.features_dc.shape))
    state = state._replace(gauss=state.gauss._replace(params=pert))

    mesh = make_mesh()
    step, n_dev = make_dp_train_step(mesh, opt, hidden, dcfg, W, H, "coarse",
                                     spatial_lr_scale=3.0, bg=(0, 0, 0),
                                     backend="reference")
    assert n_dev == 8

    camb = {k: jnp.asarray(v) for k, v in packed.items()}
    gtb = jnp.asarray(gts)
    first = None
    for it in range(1, 16):
        state, metrics = step(state, camb, gtb,
                              jnp.asarray(it, jnp.float32),
                              jnp.asarray(0, jnp.int32))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first * 0.9, (first, last)


@pytest.mark.parity
def test_dp_fine_stage_with_deformation():
    state, dcfg = _toy_state(n=48, capacity=128)
    W = H = 16
    opt = C.OptimizationParams()
    hidden = C.ModelHiddenParams()
    hidden.multires = [1]
    packed, gts = _cams_and_gts(8, W, H, state, dcfg)
    # give the cameras distinct times/frame nums (dynamic path)
    packed["time"] = np.linspace(0, 1, 8).astype(np.float32)
    packed["frame_num"] = np.arange(8, dtype=np.float32)

    mesh = make_mesh()
    step, _ = make_dp_train_step(mesh, opt, hidden, dcfg, W, H, "fine",
                                 spatial_lr_scale=3.0, bg=(0, 0, 0),
                                 backend="reference")
    camb = {k: jnp.asarray(v) for k, v in packed.items()}
    state, metrics = step(state, camb, jnp.asarray(gts),
                          jnp.asarray(1.0, jnp.float32),
                          jnp.asarray(0, jnp.int32))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parity
def test_point_sharded_step_runs_and_learns():
    """Point-sharded (tensor-parallel) step over the 8 virtual devices:
    params sharded on the point axis, image row-sharded compositing, grads
    via all_gather/reduce-scatter."""
    from mom_tpu.parallel.point_sharded import (make_points_mesh,
                                                make_ps_train_step,
                                                shard_state, pad_gt_rows)
    state, dcfg = _toy_state(n=64, capacity=128)
    W = H = 64                     # 4 tile rows -> bands of 1 tile row per device
    opt = C.OptimizationParams()
    hidden = C.ModelHiddenParams()
    packed, gts = _cams_and_gts(2, W, H, state, dcfg)

    key = jax.random.PRNGKey(0)
    pert = state.gauss.params._replace(
        features_dc=state.gauss.params.features_dc
        + 0.3 * jax.random.normal(key, state.gauss.params.features_dc.shape))
    state = state._replace(gauss=state.gauss._replace(params=pert))

    mesh = make_points_mesh(4)     # 4 devices x 1 tile row each
    build, band_h, hpad = make_ps_train_step(
        mesh, opt, hidden, dcfg, W, H, "coarse", spatial_lr_scale=3.0,
        bg=(0, 0, 0), key_cap=4096)
    assert band_h * 4 == hpad >= H
    step = build(state)
    state = shard_state(state, mesh)

    first = None
    for it in range(1, 13):
        vi = it % 2
        cam = {k: jnp.asarray(v[vi]) for k, v in packed.items()}
        gt = jnp.asarray(pad_gt_rows(gts[vi], hpad))
        state, metrics = step(state, cam, gt,
                              jnp.asarray(it, jnp.float32),
                              jnp.asarray(0, jnp.int32))
        if first is None:
            first = float(metrics["loss"])
        assert int(metrics["overflow"]) == 0
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first * 0.9, (first, last)


@pytest.mark.parity
def test_point_sharded_ssim_loss_matches_replicated():
    """With lambda_dssim on, the sharded loss must equal the replicated
    step's loss: the 5-row halo exchange makes the band SSIM globally
    exact (ppermute's zero fill on missing links = the reference conv's
    zero padding at the image border)."""
    from mom_tpu.train.loop import make_train_step
    from mom_tpu.parallel.point_sharded import (make_points_mesh,
                                                make_ps_train_step,
                                                shard_state, pad_gt_rows)
    state, dcfg = _toy_state(n=64, capacity=128)
    W, H = 64, 48                  # H not divisible by the band split:
    opt = C.OptimizationParams()   # exercises the masked bottom rows
    opt.lambda_dssim = 0.25
    hidden = C.ModelHiddenParams()
    packed, gts = _cams_and_gts(1, W, H, state, dcfg)

    key = jax.random.PRNGKey(1)
    pert = state.gauss.params._replace(
        features_dc=state.gauss.params.features_dc
        + 0.3 * jax.random.normal(key, state.gauss.params.features_dc.shape))
    state = state._replace(gauss=state.gauss._replace(params=pert))

    rep_step = make_train_step(opt, hidden, dcfg, W, H, "coarse",
                               spatial_lr_scale=3.0, bg=(0, 0, 0),
                               key_cap=4096, backend="tiled")
    camb = {k: jnp.asarray(v[0:1]) for k, v in packed.items()}
    state_rep = jax.tree.map(
        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)
    _, m_rep = rep_step(state_rep, camb, jnp.asarray(gts[0:1]),
                        jnp.asarray(1.0, jnp.float32),
                        jnp.asarray(0, jnp.int32))

    mesh = make_points_mesh(4)
    build, band_h, hpad = make_ps_train_step(
        mesh, opt, hidden, dcfg, W, H, "coarse", spatial_lr_scale=3.0,
        bg=(0, 0, 0), key_cap=4096)
    step = build(state)
    state_ps = shard_state(state, mesh)
    cam = {k: jnp.asarray(v[0]) for k, v in packed.items()}
    gt = jnp.asarray(pad_gt_rows(gts[0], hpad))
    _, m_ps = step(state_ps, cam, gt, jnp.asarray(1.0, jnp.float32),
                   jnp.asarray(0, jnp.int32))

    assert np.isfinite(float(m_ps["loss"]))
    np.testing.assert_allclose(float(m_ps["l1"]), float(m_rep["l1"]),
                               atol=2e-6)
    np.testing.assert_allclose(float(m_ps["loss"]), float(m_rep["loss"]),
                               atol=2e-5)


@pytest.mark.parity
def test_point_sharded_structural_ops():
    """Sharded densify/prune/opacity-reset run shard-locally inside the TP
    path (no full-model gather) and preserve the structural invariants:
    alive-count bookkeeping, Adam-moment zeroing, opacity cap after reset."""
    from mom_tpu.parallel.point_sharded import (make_points_mesh,
                                                make_ps_train_step,
                                                make_ps_structural_ops,
                                                shard_state, pad_gt_rows)
    state, dcfg = _toy_state(n=64, capacity=128)
    W = H = 64
    opt = C.OptimizationParams()
    hidden = C.ModelHiddenParams()
    packed, gts = _cams_and_gts(2, W, H, state, dcfg)

    mesh = make_points_mesh(4)
    build, band_h, hpad = make_ps_train_step(
        mesh, opt, hidden, dcfg, W, H, "coarse", spatial_lr_scale=3.0,
        bg=(0, 0, 0), key_cap=4096)
    step = build(state)
    densify_op, prune_op, reset_op = make_ps_structural_ops(mesh, state)
    state = shard_state(state, mesh)

    # a few steps to accumulate densification stats
    for it in range(1, 5):
        vi = it % 2
        cam = {k: jnp.asarray(v[vi]) for k, v in packed.items()}
        gt = jnp.asarray(pad_gt_rows(gts[vi], hpad))
        state, metrics = step(state, cam, gt,
                              jnp.asarray(it, jnp.float32),
                              jnp.asarray(0, jnp.int32))
    alive0 = int(metrics["points"])
    assert alive0 == 64
    pre_alive = np.asarray(state.gauss.aux.alive)

    # densify with threshold 0: every visible point qualifies; clones/splits
    # land in shard-local free slots with zeroed Adam moments
    state, n_alive = densify_op(state, jnp.asarray(0.0),
                                jnp.asarray(opt.percent_dense),
                                jnp.asarray(3.0))
    n_alive = int(n_alive)
    assert n_alive > alive0
    alive = np.asarray(state.gauss.aux.alive)
    new_rows = alive & ~pre_alive
    assert new_rows.sum() == n_alive - alive0
    mu_xyz = np.asarray(state.adam.m["xyz"])
    assert np.all(mu_xyz[new_rows] == 0.0)

    # run more train steps so moments repopulate (state layout unchanged)
    for it in range(5, 7):
        vi = it % 2
        cam = {k: jnp.asarray(v[vi]) for k, v in packed.items()}
        gt = jnp.asarray(pad_gt_rows(gts[vi], hpad))
        state, metrics = step(state, cam, gt,
                              jnp.asarray(it, jnp.float32),
                              jnp.asarray(0, jnp.int32))
    assert np.isfinite(float(metrics["loss"]))

    # prune at opacity threshold 0 (size test disabled) kills nothing
    state, n_after = prune_op(state, jnp.asarray(0.0), jnp.asarray(3.0),
                              jnp.asarray(-1.0))
    assert int(n_after) == n_alive

    # opacity reset caps activated opacity at 0.01 on every shard and
    # zeroes the opacity moments
    state, n_reset = reset_op(state, jnp.asarray(0.0))
    assert int(n_reset) == n_alive
    opac = 1.0 / (1.0 + np.exp(-np.asarray(state.gauss.params.opacity)))
    assert float(opac[np.asarray(state.gauss.aux.alive)].max()) <= 0.0101
    assert float(np.abs(np.asarray(state.adam.m["opacity"])).max()) == 0.0

    # prune at min_opacity 0.02 now kills every alive point (all reset to
    # 0.01), shard-locally
    state, n_pruned = prune_op(state, jnp.asarray(0.02), jnp.asarray(3.0),
                               jnp.asarray(-1.0))
    assert int(n_pruned) == 0

    # the train step still runs after structural ops (no reshard needed)
    cam = {k: jnp.asarray(v[0]) for k, v in packed.items()}
    gt = jnp.asarray(pad_gt_rows(gts[0], hpad))
    state, metrics = step(state, cam, gt, jnp.asarray(7.0, jnp.float32),
                          jnp.asarray(0, jnp.int32))
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["points"]) == 0


@pytest.mark.parity
def test_dp_x_tp_2d_mesh_matches_replicated_batch():
    """Composed parallelism on a 2D (data, points) mesh: 2 dp groups x 4 tp
    shards.  One step with two views (one per dp group) must match the
    replicated batched step at batch_size=2 — same loss/l1 and the same
    updated parameters (the dp pmean reproduces the stacked-batch mean-loss
    gradients; viewspace-stat pmean / radii pmax reproduce the reference's
    batch sum/max, train_4DGS.py:203-204, 227-229)."""
    from mom_tpu.train.loop import make_train_step
    from mom_tpu.parallel.point_sharded import (make_mesh2d, DP_AXIS,
                                                make_ps_train_step,
                                                shard_state, unshard_state,
                                                pad_gt_rows)
    state, dcfg = _toy_state(n=64, capacity=128)
    W, H = 64, 48                  # masked bottom rows in the last band
    opt = C.OptimizationParams()
    opt.lambda_dssim = 0.25        # exercise the halo-exact sharded SSIM too
    hidden = C.ModelHiddenParams()
    packed, gts = _cams_and_gts(2, W, H, state, dcfg)

    key = jax.random.PRNGKey(2)
    pert = state.gauss.params._replace(
        features_dc=state.gauss.params.features_dc
        + 0.3 * jax.random.normal(key, state.gauss.params.features_dc.shape))
    state = state._replace(gauss=state.gauss._replace(params=pert))

    # replicated batched reference step (scan-vs-single bit-exactness of
    # this path is covered elsewhere)
    rep_step = make_train_step(opt, hidden, dcfg, W, H, "coarse",
                               spatial_lr_scale=3.0, bg=(0, 0, 0),
                               key_cap=4096, backend="tiled",
                               batch_size=2)
    state_rep = jax.tree.map(
        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)
    camb = {k: jnp.asarray(v[0:2]) for k, v in packed.items()}
    state_rep, m_rep = rep_step(state_rep, camb, jnp.asarray(gts[0:2]),
                                jnp.asarray(1.0, jnp.float32),
                                jnp.asarray(0, jnp.int32))

    mesh = make_mesh2d(2, 4)
    build, band_h, hpad = make_ps_train_step(
        mesh, opt, hidden, dcfg, W, H, "coarse", spatial_lr_scale=3.0,
        bg=(0, 0, 0), key_cap=4096, dp_axis=DP_AXIS)
    step = build(state)
    state_2d = shard_state(state, mesh)
    cam2 = {k: jnp.asarray(v[0:2]) for k, v in packed.items()}
    gt2 = jnp.asarray(np.stack([pad_gt_rows(gts[0], hpad),
                                pad_gt_rows(gts[1], hpad)]))
    state_2d, m_2d = step(state_2d, cam2, gt2,
                          jnp.asarray(1.0, jnp.float32),
                          jnp.asarray(0, jnp.int32))

    np.testing.assert_allclose(float(m_2d["l1"]), float(m_rep["l1"]),
                               atol=2e-6)
    np.testing.assert_allclose(float(m_2d["loss"]), float(m_rep["loss"]),
                               atol=2e-5)
    host = unshard_state(state_2d, mesh)
    for name in ("xyz", "features_dc", "opacity", "scaling"):
        a = np.asarray(getattr(host.gauss.params, name))
        b = np.asarray(getattr(state_rep.gauss.params, name))
        np.testing.assert_allclose(a, b, atol=3e-4, err_msg=name)
    # densification stats follow the batch sum/max semantics
    np.testing.assert_allclose(
        np.asarray(host.gauss.aux.xyz_gradient_accum),
        np.asarray(state_rep.gauss.aux.xyz_gradient_accum), atol=3e-4)


@pytest.mark.parity
def test_dp_step_matches_replicated_batch():
    """One DP step over 8 views must match the replicated batched step at
    batch_size=8: same updated params AND the same densification stats
    (the stats reduction is pmean — the replicated stacked-batch loss gives
    each view's viewspace grad a 1/nb factor that a per-view DP loss
    lacks)."""
    from mom_tpu.train.loop import make_train_step
    state, dcfg = _toy_state(n=64, capacity=128)
    W = H = 32
    opt = C.OptimizationParams()
    hidden = C.ModelHiddenParams()
    packed, gts = _cams_and_gts(8, W, H, state, dcfg)
    key = jax.random.PRNGKey(4)
    pert = state.gauss.params._replace(
        features_dc=state.gauss.params.features_dc
        + 0.3 * jax.random.normal(key, state.gauss.params.features_dc.shape))
    state = state._replace(gauss=state.gauss._replace(params=pert))

    rep_step = make_train_step(opt, hidden, dcfg, W, H, "coarse",
                               spatial_lr_scale=3.0, bg=(0, 0, 0),
                               key_cap=4096, backend="tiled", batch_size=8)
    state_rep = jax.tree.map(
        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)
    camb = {k: jnp.asarray(v) for k, v in packed.items()}
    state_rep, m_rep = rep_step(state_rep, camb, jnp.asarray(gts),
                                jnp.asarray(1.0, jnp.float32),
                                jnp.asarray(0, jnp.int32))

    mesh = make_mesh()
    dp_step, _ = make_dp_train_step(mesh, opt, hidden, dcfg, W, H, "coarse",
                                    spatial_lr_scale=3.0, bg=(0, 0, 0),
                                    backend="tiled")
    state_dp, m_dp = dp_step(state, camb, jnp.asarray(gts),
                             jnp.asarray(1.0, jnp.float32),
                             jnp.asarray(0, jnp.int32))

    np.testing.assert_allclose(float(m_dp["l1"]), float(m_rep["l1"]),
                               atol=2e-6)
    for name in ("xyz", "features_dc", "opacity", "scaling"):
        a = np.asarray(jax.device_get(getattr(state_dp.gauss.params, name)))
        b = np.asarray(getattr(state_rep.gauss.params, name))
        np.testing.assert_allclose(a, b, atol=3e-4, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(state_dp.gauss.aux.xyz_gradient_accum)),
        np.asarray(state_rep.gauss.aux.xyz_gradient_accum), atol=3e-4)


@pytest.mark.parity
def test_structural_ops_on_2d_mesh_match_1d():
    """densify/prune on a 2D (data, points) mesh must produce exactly the
    state the same ops produce on a 1D points mesh: the split-noise RNG
    folds only on the points axis index, so every dp replica makes
    identical decisions and the state stays dp-replicated."""
    from mom_tpu.parallel.point_sharded import (
        make_points_mesh, make_mesh2d, make_ps_structural_ops,
        shard_state, unshard_state)
    state, dcfg = _toy_state(n=64, capacity=128)

    mesh1 = make_points_mesh(4)
    mesh2 = make_mesh2d(2, 4)
    d1, p1, _ = make_ps_structural_ops(mesh1, state)
    d2, p2, _ = make_ps_structural_ops(mesh2, state)

    # deep-copy: shard_state's device_put is a no-copy alias for replicated
    # leaves, and the ops donate their input state
    state_b = jax.tree.map(
        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)
    s1 = shard_state(state, mesh1)
    s2 = shard_state(state_b, mesh2)
    s1, n1 = d1(s1, jnp.asarray(0.0), jnp.asarray(0.01), jnp.asarray(3.0))
    s2, n2 = d2(s2, jnp.asarray(0.0), jnp.asarray(0.01), jnp.asarray(3.0))
    assert int(n1) == int(n2)
    s1, k1 = p1(s1, jnp.asarray(0.005), jnp.asarray(3.0), jnp.asarray(-1.0))
    s2, k2 = p2(s2, jnp.asarray(0.005), jnp.asarray(3.0), jnp.asarray(-1.0))
    assert int(k1) == int(k2)
    h1 = unshard_state(s1, mesh1)
    h2 = unshard_state(s2, mesh2)
    for a, b in zip(jax.tree.leaves(h1), jax.tree.leaves(h2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
