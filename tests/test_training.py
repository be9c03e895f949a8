"""Unit tests for the optimizer + fixed-capacity model ops, and a small
end-to-end coarse training convergence test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mom_tpu import config
from mom_tpu.models import gaussians as G
from mom_tpu.models import deformation as D
from mom_tpu.models.hexplane import HexPlaneConfig
from mom_tpu.train import optim
from mom_tpu.train.loop import (TrainState, make_train_step, densify_op,
                                prune_op, reset_opacity_op, Schedule,
                                ViewpointSampler)
from mom_tpu.cameras import Camera, pack_cameras


@pytest.mark.parity
def test_adam_matches_torch():
    import torch
    rng = np.random.RandomState(0)
    p0 = rng.randn(5, 3).astype(np.float32)
    grads = [rng.randn(5, 3).astype(np.float32) for _ in range(4)]

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([tp], lr=0.01, eps=1e-15)
    for g in grads:
        tp.grad = torch.tensor(g)
        topt.step()

    params = {"xyz": jnp.asarray(p0)}
    state = optim.init_adam(params)
    lrs = {"xyz": 0.01}
    for g in grads:
        params, state = optim.adam_step(params, {"xyz": jnp.asarray(g)},
                                        state, lrs)
    np.testing.assert_allclose(np.asarray(params["xyz"]),
                               tp.detach().numpy(), atol=1e-6)


def test_adam_mask_freezes_rows():
    params = {"xyz": jnp.ones((4, 2))}
    state = optim.init_adam(params)
    grads = {"xyz": jnp.ones((4, 2))}
    mask = {"xyz": jnp.array([True, False, True, False])}
    params2, state2 = optim.adam_step(params, grads, state, {"xyz": 0.1},
                                     update_mask=mask)
    p = np.asarray(params2["xyz"])
    assert np.all(p[0] != 1.0) and np.all(p[2] != 1.0)
    assert np.all(p[1] == 1.0) and np.all(p[3] == 1.0)
    assert np.all(np.asarray(state2.m["xyz"])[1] == 0.0)


def _toy_state(n=64, capacity=128, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(3, 6, n)], -1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    flow = rng.randn(n, 3).astype(np.float32) * 0.01
    gauss = G.create_from_pcd(pts, cols, flow, flow_scale=2.0,
                              capacity=capacity)
    dcfg = D.DeformConfig(grid=HexPlaneConfig(out_dim=8,
                                              resolution=(8, 8, 8, 4),
                                              multires=(1,)),
                          defor_depth=0, net_width=16)
    dparams = D.init_deformation(jax.random.PRNGKey(0), dcfg)
    groups = {
        "xyz": gauss.params.xyz, "f_dc": gauss.params.features_dc,
        "f_rest": gauss.params.features_rest,
        "opacity": gauss.params.opacity, "scaling": gauss.params.scaling,
        "rotation": gauss.params.rotation,
        "deformation": D.mlp_param_tree(dparams),
        "grid": dparams["grid"]["grids"],
    }
    adam = optim.init_adam(groups)
    return TrainState(gauss=gauss, deform=dparams, adam=adam,
                      rng=jax.random.PRNGKey(42)), dcfg


def test_create_from_pcd_matches_reference_init():
    state, _ = _toy_state(n=64, capacity=128)
    p = state.gauss.params
    # opacity logit of 0.1
    assert abs(float(jax.nn.sigmoid(p.opacity[0, 0])) - 0.1) < 1e-5
    # identity quats
    np.testing.assert_allclose(np.asarray(p.rotation[:64]),
                               np.tile([1, 0, 0, 0], (64, 1)), atol=0)
    # flow scaled by 2
    assert int(state.gauss.num_alive) == 64
    # dead slots are inert
    assert float(p.scaling[100, 0]) == G.DEAD_SCALE


def test_densify_and_prune_roundtrip():
    state, _ = _toy_state(n=64, capacity=256)
    aux = state.gauss.aux
    # force high grads on a few points: 2 small (clone), 2 large (split)
    accum = np.zeros(256, np.float32)
    accum[[0, 1, 2, 3]] = 10.0
    denom = np.zeros(256, np.float32)
    denom[:64] = 1.0
    scaling = np.array(state.gauss.params.scaling)
    scaling[2] = np.log(10.0)   # large -> split
    scaling[3] = np.log(10.0)
    gauss = state.gauss._replace(
        params=state.gauss.params._replace(scaling=jnp.asarray(scaling)),
        aux=aux._replace(xyz_gradient_accum=jnp.asarray(accum),
                         denom=jnp.asarray(denom)))
    state = state._replace(gauss=gauss)

    n0 = int(state.gauss.num_alive)
    state2 = densify_op(state, 0.5, percent_dense=0.01, scene_extent=5.0)
    # clone: +2, split: +2 (one child reuses the original slot)
    assert int(state2.gauss.num_alive) == n0 + 4
    # stats reset
    assert float(jnp.sum(state2.gauss.aux.xyz_gradient_accum)) == 0.0

    # prune everything below huge opacity threshold
    state3, = (prune_op(state2, 0.99, 5.0, None, False),)
    assert int(state3.gauss.num_alive) == 0


def test_reset_opacity():
    state, _ = _toy_state()
    state2 = reset_opacity_op(state)
    opac = jax.nn.sigmoid(np.asarray(state2.gauss.params.opacity[:64]))
    assert np.all(opac <= 0.0101)


def test_schedule_matches_reference_cadence():
    opt = config.OptimizationParams()
    sched = Schedule(opt, "coarse")
    # prune only fires above 200k alive points (train_4DGS.py:279)
    assert sched.structural_actions(600, 100_000) == (True, False, False)
    assert sched.structural_actions(600, 250_000) == (True, True, False)
    assert sched.structural_actions(650, 100_000) == (False, False, False)
    assert sched.structural_actions(3000, 250_000) == (True, True, True)
    assert sched.structural_actions(16_000, 250_000) == (False, False, False)
    # densify capped at 360k (train_4DGS.py:275)
    assert sched.structural_actions(600, 400_000)[0] is False
    o, d = sched.thresholds(100)
    assert o == opt.opacity_threshold_coarse
    assert d == opt.densify_grad_threshold_coarse


def test_coarse_training_improves_psnr():
    state, dcfg = _toy_state(n=64, capacity=128)
    opt = config.OptimizationParams()
    hidden = config.ModelHiddenParams()
    W = H = 32
    cams = []
    rng = np.random.RandomState(5)
    for i in range(3):
        th = (i - 1) * 0.1
        R = np.array([[np.cos(th), 0, -np.sin(th)], [0, 1, 0],
                      [np.sin(th), 0, np.cos(th)]])
        cams.append(Camera(R=R, T=np.zeros(3), fovx=0.8, fovy=0.8,
                           width=W, height=H, time=0.0, frame_num=0))
    packed = pack_cameras(cams)

    # ground truth = render of a perturbed copy (so it's representable)
    from mom_tpu.render import render as render_fn
    gt_imgs = []
    for i in range(3):
        cam_i = {k: jnp.asarray(v[i]) for k, v in packed.items()}
        out = render_fn(state.gauss.params, state.gauss.aux, state.deform,
                        dcfg, cam_i, W, H, jnp.zeros(3), stage="coarse",
                        active_sh_degree=0, backend="reference")
        gt_imgs.append(np.asarray(jnp.clip(out.color, 0, 1)))
    gts = (np.stack(gt_imgs) * 255).astype(np.uint8)

    # perturb the state so there is something to learn
    key = jax.random.PRNGKey(1)
    pert = state.gauss.params._replace(
        features_dc=state.gauss.params.features_dc
        + 0.3 * jax.random.normal(key, state.gauss.params.features_dc.shape),
        opacity=state.gauss.params.opacity - 1.0)
    state = state._replace(gauss=state.gauss._replace(params=pert))

    step = make_train_step(opt, hidden, dcfg, W, H, "coarse",
                           spatial_lr_scale=3.0, bg=(0, 0, 0),
                           backend="reference")
    sampler = ViewpointSampler(3)
    first_psnr = None
    last = None
    for it in range(1, 46):
        vi = sampler.next()
        camb = {k: jnp.asarray(v[vi:vi + 1]) for k, v in packed.items()}
        gtb = jnp.asarray(gts[vi:vi + 1])
        state, metrics = step(state, camb, gtb, jnp.asarray(it, jnp.float32),
                              jnp.asarray(0, jnp.int32))
        if first_psnr is None:
            first_psnr = float(metrics["psnr"])
        last = metrics
    assert np.isfinite(float(last["loss"]))
    assert float(last["psnr"]) > first_psnr + 2.0, (first_psnr,
                                                   float(last["psnr"]))


@pytest.mark.parity
def test_compact_resume_capacity():
    """compact_train_state gathers alive rows (params, stats, Adam moments)
    into a smaller capacity and training continues with identical dynamics:
    the post-compact step must produce the same loss as the uncompacted
    continuation."""
    from mom_tpu.data import checkpoints as ckpt_io

    state, dcfg = _toy_state(n=64, capacity=4096)
    opt = config.OptimizationParams()
    hidden = config.ModelHiddenParams()
    W = H = 32
    th = 0.1
    R = np.array([[np.cos(th), 0, -np.sin(th)], [0, 1, 0],
                  [np.sin(th), 0, np.cos(th)]])
    packed = pack_cameras([Camera(R=R, T=np.zeros(3), fovx=0.8, fovy=0.8,
                                  width=W, height=H, time=0.0, frame_num=0)])
    camb = {k: jnp.asarray(v[0:1]) for k, v in packed.items()}
    gts = (np.full((1, H, W, 3), 0.4) * 255).astype(np.uint8)

    step = make_train_step(opt, hidden, dcfg, W, H, "coarse",
                           spatial_lr_scale=3.0, bg=(0, 0, 0),
                           backend="reference")
    for it in range(1, 4):   # build up nonzero Adam moments
        state, m = step(state, camb, jnp.asarray(gts),
                        jnp.asarray(float(it), jnp.float32),
                        jnp.asarray(0, jnp.int32))

    # host leaves (the resume situation), then compact
    host = jax.tree.map(np.asarray, state)
    comp, did = ckpt_io.compact_train_state(host, headroom=2.0,
                                            min_capacity=128, align=128)
    assert did and comp.gauss.capacity == 128
    assert int(comp.gauss.num_alive) == int(state.gauss.num_alive) == 64
    # params and Adam moments follow their rows
    np.testing.assert_array_equal(np.asarray(comp.gauss.params.xyz[:64]),
                                  np.asarray(state.gauss.params.xyz[:64]))
    np.testing.assert_array_equal(np.asarray(comp.adam.m["xyz"][:64]),
                                  np.asarray(state.adam.m["xyz"][:64]))
    assert np.any(np.asarray(comp.adam.m["xyz"][:64]) != 0.0)
    # deformation group untouched
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(comp.adam.m["deformation"])[0]),
        np.asarray(jax.tree.leaves(state.adam.m["deformation"])[0]))

    # identical training dynamics at the new shapes
    step_c = make_train_step(opt, hidden, dcfg, W, H, "coarse",
                             spatial_lr_scale=3.0, bg=(0, 0, 0),
                             backend="reference")
    _, m_full = step(state, camb, jnp.asarray(gts),
                     jnp.asarray(4.0, jnp.float32), jnp.asarray(0, jnp.int32))
    _, m_comp = step_c(comp, camb, jnp.asarray(gts),
                       jnp.asarray(4.0, jnp.float32),
                       jnp.asarray(0, jnp.int32))
    np.testing.assert_allclose(float(m_comp["loss"]), float(m_full["loss"]),
                               rtol=1e-5)
    # hysteresis: a small shrink is refused
    _, did2 = ckpt_io.compact_train_state(comp, headroom=2.0,
                                          min_capacity=128, align=128)
    assert not did2


@pytest.mark.parity
def test_multistep_matches_single_steps():
    """One K-iteration lax.scan program must reproduce K chained single
    steps bit-for-bit (same body, same view sequence, same LR schedule)."""
    from mom_tpu.train.loop import make_chunked_steps

    state, dcfg = _toy_state(n=48, capacity=128)
    opt = config.OptimizationParams()
    hidden = config.ModelHiddenParams()
    W = H = 24
    cams = []
    for i in range(3):
        th = (i - 1) * 0.1
        R = np.array([[np.cos(th), 0, -np.sin(th)], [0, 1, 0],
                      [np.sin(th), 0, np.cos(th)]])
        cams.append(Camera(R=R, T=np.zeros(3), fovx=0.8, fovy=0.8,
                           width=W, height=H, time=i / 2.0, frame_num=i))
    packed_dev = {k: jnp.asarray(v) for k, v in pack_cameras(cams).items()}
    rngg = np.random.RandomState(0)
    gts_dev = jnp.asarray(rngg.randint(0, 255, (3, H, W, 3), dtype=np.uint8))

    step = make_train_step(opt, hidden, dcfg, W, H, "fine",
                           spatial_lr_scale=3.0, bg=(0, 0, 0),
                           backend="reference")
    multistep, step1 = make_chunked_steps(step, 4)
    vis = [0, 2, 1, 0]

    sa = jax.tree.map(jnp.copy, state)
    losses_a = []
    for j, vi in enumerate(vis):
        sa, m = step1(sa, packed_dev, gts_dev, jnp.asarray(vi, jnp.int32),
                      jnp.asarray(float(j + 1), jnp.float32),
                      jnp.asarray(1, jnp.int32))
        losses_a.append(float(m["loss"]))

    sb = jax.tree.map(jnp.copy, state)
    sb, losses_b = multistep(sb, packed_dev, gts_dev,
                             jnp.asarray(vis, jnp.int32),
                             jnp.asarray(1.0, jnp.float32),
                             jnp.asarray(1, jnp.int32))

    np.testing.assert_array_equal(np.asarray(losses_b),
                                  np.asarray(losses_a, np.float32))
    np.testing.assert_array_equal(np.asarray(sa.gauss.params.xyz),
                                  np.asarray(sb.gauss.params.xyz))
    np.testing.assert_array_equal(np.asarray(sa.adam.m["xyz"]),
                                  np.asarray(sb.adam.m["xyz"]))
    assert int(sa.adam.step) == int(sb.adam.step) == 4


def test_batched_step_matches_reference_semantics():
    """batch_size=nb: nb views render per iteration, loss over the stacked
    batch, radii max / viewspace-grad sum (reference train_4DGS.py:172-205
    collates nb views). The chunked scan must still match chained single
    steps bit-for-bit, and a 2-view batch of the SAME view must produce the
    single-view loss."""
    from mom_tpu.train.loop import make_chunked_steps

    state, dcfg = _toy_state(n=48, capacity=128)
    opt = config.OptimizationParams()
    hidden = config.ModelHiddenParams()
    W = H = 24
    cams = []
    for i in range(3):
        th = (i - 1) * 0.1
        R = np.array([[np.cos(th), 0, -np.sin(th)], [0, 1, 0],
                      [np.sin(th), 0, np.cos(th)]])
        cams.append(Camera(R=R, T=np.zeros(3), fovx=0.8, fovy=0.8,
                           width=W, height=H, time=i / 2.0, frame_num=i))
    packed_dev = {k: jnp.asarray(v) for k, v in pack_cameras(cams).items()}
    rngg = np.random.RandomState(0)
    gts_dev = jnp.asarray(rngg.randint(0, 255, (3, H, W, 3), dtype=np.uint8))

    step2 = make_train_step(opt, hidden, dcfg, W, H, "fine",
                            spatial_lr_scale=3.0, bg=(0, 0, 0),
                            backend="reference", batch_size=2)
    multistep, step1 = make_chunked_steps(step2, 3, batch_size=2)
    vis = np.asarray([[0, 2], [1, 0], [2, 1]], np.int32)

    sa = jax.tree.map(jnp.copy, state)
    losses_a = []
    for j in range(3):
        sa, m = step1(sa, packed_dev, gts_dev, jnp.asarray(vis[j]),
                      jnp.asarray(float(j + 1), jnp.float32),
                      jnp.asarray(1, jnp.int32))
        losses_a.append(float(m["loss"]))
    assert np.all(np.isfinite(losses_a))

    sb = jax.tree.map(jnp.copy, state)
    sb, losses_b = multistep(sb, packed_dev, gts_dev, jnp.asarray(vis),
                             jnp.asarray(1.0, jnp.float32),
                             jnp.asarray(1, jnp.int32))
    np.testing.assert_array_equal(np.asarray(losses_b),
                                  np.asarray(losses_a, np.float32))
    np.testing.assert_array_equal(np.asarray(sa.gauss.params.xyz),
                                  np.asarray(sb.gauss.params.xyz))

    # same view twice == that view's single-view loss (L1 over the batch)
    step1b = make_train_step(opt, hidden, dcfg, W, H, "fine",
                             spatial_lr_scale=3.0, bg=(0, 0, 0),
                             backend="reference", batch_size=1)
    sc = jax.tree.map(jnp.copy, state)
    _, m1 = step1b(sc, {k: v[1:2] for k, v in packed_dev.items()},
                   gts_dev[1:2], jnp.asarray(1.0, jnp.float32),
                   jnp.asarray(1, jnp.int32))
    sd = jax.tree.map(jnp.copy, state)
    _, m2 = step2(sd, {k: jnp.stack([v[1], v[1]]) for k, v in
                       packed_dev.items()},
                  jnp.stack([gts_dev[1], gts_dev[1]]),
                  jnp.asarray(1.0, jnp.float32), jnp.asarray(1, jnp.int32))
    np.testing.assert_allclose(float(m1["l1"]), float(m2["l1"]), rtol=1e-6)
