"""Point-sharded multi-chip training (tensor parallelism over gaussians).

Data parallelism (data_parallel.py) replicates the model and shards views —
it caps the point count at one chip's HBM and caps the batch at n_devices.
This module shards the MODEL: gaussian parameters, their Adam moments and
the densification stats live split along the point axis across a 1D
("points",) mesh (SURVEY.md §2.5's design sketch).

Per step, inside shard_map:
  1. deformation + activations + screen-space preprocess run on the LOCAL
     point shard (embarrassingly parallel)
  2. one all_gather over ICI moves the preprocessed SoA (~11 floats/point —
     5x cheaper than gathering raw parameters) to every device
  3. each device bins and composites ITS image row band: the preprocessed
     y-coordinates are shifted by the band origin, so the rasterizer renders
     rows [band0, band0 + band_h) of the global image as a local viewport
     (identical SPMD program on every device — no device-dependent shapes)
  4. the L1 partial sums psum into the global loss; autodiff routes band
     gradients back through the all_gather (its transpose is a
     reduce-scatter), landing exactly on each device's point shard
  5. point-group Adam updates run on local shards; the replicated
     deformation/grid groups update from psum'ed gradients

The gradient stream therefore rides ICI twice per step (gather forward,
reduce-scatter backward) with no DCN involvement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import gaussians as G
from ..models import deformation as D
from ..models.hexplane import grid_regularization
from ..ops.preprocess import preprocess, Preprocessed
from ..ops.rasterize import rasterize_preprocessed, TILE
from ..train import losses
from ..train.loop import (TrainState, _params_by_group, _from_groups,
                          _deform_statics)
from ..train.optim import group_lrs, adam_step, POINT_GROUPS

AXIS = "points"
DP_AXIS = "data"


def make_points_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def make_mesh2d(n_dp: int, n_tp: int) -> Mesh:
    """2D (data, points) mesh: n_dp view-parallel groups, each point-sharding
    the model n_tp ways.  Composes the DP gradient averaging of
    data_parallel.py with this module's tensor parallelism — the TP
    collectives (all_gather/reduce-scatter/ppermute over AXIS) ride ICI
    within a dp group, the view-gradient pmean rides across groups."""
    devs = jax.devices()
    assert len(devs) >= n_dp * n_tp, (len(devs), n_dp, n_tp)
    return Mesh(np.array(devs[:n_dp * n_tp]).reshape(n_dp, n_tp),
                (DP_AXIS, AXIS))


def interleave_perm(cap: int, n: int) -> np.ndarray:
    """Round-robin permutation: after block-sharding over n devices, shard d
    holds original points d, d+n, d+2n, ...  Slot-permutation-invariant ops
    (render, Adam, densify/prune — they treat slots symmetrically) are
    unaffected; what changes is that ALIVE points (contiguous at the buffer
    start by construction, models/gaussians.py create_from_pcd) spread
    evenly across shards, balancing both preprocess work and each shard's
    FREE-SLOT pool for shard-local densification."""
    L = cap // n
    return np.arange(cap).reshape(L, n).T.reshape(-1)


def shard_state(state: TrainState, mesh: Mesh,
                interleave: bool = True) -> TrainState:
    """Place the TrainState on the mesh: per-point leading axes sharded on
    AXIS (round-robin interleaved by default — see interleave_perm),
    everything else replicated.  Capacity must divide the AXIS extent
    (pick_capacity rounds to 1024, so any power-of-two mesh works).
    On a 2D (data, points) mesh the state replicates over the data axis.
    ``unshard_state`` undoes both the sharding and the permutation."""
    n = mesh.shape[AXIS]
    cap = state.gauss.capacity
    assert cap % n == 0, (cap, n)
    perm = interleave_perm(cap, n) if interleave else None

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == cap:
            if perm is not None:
                x = jax.device_get(x)[perm]
            return jax.device_put(x, NamedSharding(mesh, P(AXIS)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, state)


def unshard_state(state: TrainState, mesh: Mesh,
                  interleave: bool = True) -> TrainState:
    """Gather a sharded TrainState to host and restore the original point
    order (inverse of shard_state)."""
    n = mesh.shape[AXIS]
    cap = state.gauss.capacity
    inv = None
    if interleave:
        perm = interleave_perm(cap, n)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(cap)

    def pull(x):
        v = jax.device_get(x)
        if inv is not None and hasattr(v, "shape") and v.ndim >= 1 \
                and v.shape[0] == cap:
            return v[inv]
        return v

    return jax.tree.map(pull, state)


def make_ps_train_step(mesh: Mesh, opt_cfg, hidden_cfg,
                       deform_cfg: D.DeformConfig, width: int, height: int,
                       stage: str, spatial_lr_scale: float, bg,
                       key_cap: int, dp_axis: str | None = None):
    """Jitted point-sharded step for ONE camera per iteration.  GT images
    arrive row-sharded: gts (hpad, W, 3) with hpad = n_tp * band_h.

    With ``dp_axis`` set (a 2D make_mesh2d mesh), each data-parallel group
    trains on ITS OWN camera per iteration: cams carry a leading n_dp axis
    and gts are (n_dp, hpad, W, 3).  Gradients and viewspace-grad stats
    pmean over the data axis (matching the replicated batched loop's
    stacked-batch mean-loss semantics, train/loop.py), radii pmax over it
    (the reference's max over the view batch, train_4DGS.py:203-204,
    227-229)."""
    n_dev = mesh.shape[AXIS]
    bgj = jnp.asarray(bg, jnp.float32)
    gy = (height + TILE - 1) // TILE
    band_ty = (gy + n_dev - 1) // n_dev          # tile rows per device
    band_h = band_ty * TILE
    hpad = band_h * n_dev
    use_tv = stage == "fine" and hidden_cfg.time_smoothness_weight != 0
    use_ssim = opt_cfg.lambda_dssim != 0
    # per-shard instance budget: each device only bins its band
    # (CHUNK-aligned — bin_gaussians enforces it; 128 was only right at the
    # default chunk size)
    from ..ops.rasterize import CHUNK as _CHUNK
    local_cap = max((key_cap // n_dev + _CHUNK - 1) // _CHUNK * _CHUNK,
                    8 * _CHUNK)

    def local_loss(groups, statics, aux, cam, gt_band, sh_degree, offset,
                   band0):
        params, deform = _from_groups(groups, statics)
        means3d = params.xyz
        shs = G.get_features(params)
        if stage == "coarse":
            means_f, scales_f, rot_f, opac_f, shs_f = (
                means3d, params.scaling, params.rotation, params.opacity,
                shs)
        else:
            nloc = means3d.shape[0]
            times = jnp.broadcast_to(cam["time"], (nloc,))
            means_f, scales_f, rot_f, opac_f, shs_f = D.deform(
                deform, deform_cfg, means3d, params.scaling, params.rotation,
                params.opacity, shs, times, aux.scene_flow,
                cam["frame_num"], 1.0, uniform_time=True)
        scales_act = jnp.exp(scales_f)
        rot_act = rot_f / jnp.maximum(
            jnp.linalg.norm(rot_f, axis=-1, keepdims=True), 1e-12)
        opac_act = jax.nn.sigmoid(opac_f)

        pre_local = preprocess(
            means_f, scales_act, rot_act, opac_act[:, 0], shs_f,
            cam["viewmatrix"], cam["projmatrix"], cam["campos"],
            cam["tanfovx"], cam["tanfovy"], width, height,
            sh_degree, 1.0, means2d_offset=offset, alive_mask=aux.alive)

        # ICI: gather the compact screen-space SoA; grads reduce-scatter back
        pre_full = jax.tree.map(
            lambda a: jax.lax.all_gather(a, AXIS, tiled=True), pre_local)

        # shift into this device's band viewport (identical SPMD program)
        shifted = pre_full._replace(means2d=pre_full.means2d.at[:, 1].add(
            -band0.astype(jnp.float32)))
        out = rasterize_preprocessed(shifted, width, band_h, bgj, local_cap)

        gtf = gt_band.astype(jnp.float32) / 255.0
        rows = band0 + jnp.arange(band_h)
        rmask = (rows < height).astype(jnp.float32)[:, None, None]
        abs_sum = jax.lax.psum(
            jnp.sum(jnp.abs(out.color - gtf) * rmask), AXIS)
        # rmask is (band_h, 1, 1): its sum counts ROWS, so multiply the
        # row count out to pixels*channels (this denominator was W× short,
        # scaling the TP loss and its gradients by W)
        n_px = jax.lax.psum(jnp.sum(rmask) * (width * 3.0), AXIS)
        ll1 = abs_sum / n_px
        loss = ll1
        if use_tv:
            loss = loss + grid_regularization(
                deform["grid"], hidden_cfg.time_smoothness_weight,
                hidden_cfg.l1_time_planes, hidden_cfg.plane_tv_weight)
        if use_ssim:
            # globally-exact SSIM: exchange a 5-row halo with the band
            # neighbors over ICI so the 11px window sees real rows across
            # band seams.  ppermute delivers ZEROS on missing links (device
            # 0's top, device n-1's bottom), which is exactly the
            # reference's zero-padded conv at the image border
            # (utils/loss_utils.py:52-92, torch conv2d padding=5); rows
            # beyond the true image height are zero-masked on both inputs,
            # again matching the zero padding at the bottom border.
            pad = 5
            col_m = out.color * rmask
            gt_m = gtf * rmask

            def halo_extend(x):
                top = jax.lax.ppermute(
                    x[-pad:], AXIS, [(i, i + 1) for i in range(n_dev - 1)])
                bot = jax.lax.ppermute(
                    x[:pad], AXIS, [(i + 1, i) for i in range(n_dev - 1)])
                return jnp.concatenate([top, x, bot], axis=0)

            smap = losses.ssim_map(halo_extend(col_m),
                                   halo_extend(gt_m))[0, pad:pad + band_h]
            ssim_mean = jax.lax.psum(jnp.sum(smap * rmask), AXIS) / n_px
            loss = loss + opt_cfg.lambda_dssim * (1.0 - ssim_mean)
        mse = jax.lax.psum(jnp.sum(((out.color - gtf) * rmask) ** 2),
                           AXIS) / n_px
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
        return loss, (ll1, psnr, pre_local.radii, out.overflow)

    def sharded_step(state: TrainState, cam: dict, gts: jnp.ndarray,
                     iteration, sh_degree):
        groups = _params_by_group(state.gauss.params, state.deform)
        statics = _deform_statics(state.deform)
        cap_local = state.gauss.params.xyz.shape[0]
        offset = jnp.zeros((cap_local, 2), jnp.float32)
        band0 = jax.lax.axis_index(AXIS) * band_h
        if dp_axis is not None:
            # per-dp-group view: the dp block size is 1, drop that axis
            cam = jax.tree.map(lambda a: a[0], cam)
            gts = gts[0]

        (loss, (ll1, psnr, radii, overflow)), grads = jax.value_and_grad(
            local_loss, argnums=(0, 6), has_aux=True)(
            groups, statics, state.gauss.aux, cam, gts, sh_degree, offset,
            band0)
        ggroups, goffset = grads

        if dp_axis is not None:
            # mean-over-views gradient (the replicated batched loop computes
            # l1/ssim over the stacked batch = a mean over views)
            ggroups = jax.tree.map(
                lambda g: jax.lax.pmean(g, dp_axis), ggroups)
            # the replicated loop's "sum over batch" of per-view offset grads
            # equals a pmean here: its stacked-batch mean loss already gives
            # each view's grad a 1/nb factor that the dp per-view loss lacks
            goffset = jax.lax.pmean(goffset, dp_axis)
            radii = jax.lax.pmax(radii, dp_axis)
            loss, ll1, psnr = (jax.lax.pmean(x, dp_axis)
                               for x in (loss, ll1, psnr))
            overflow = jax.lax.pmax(overflow, dp_axis)

        # The loss leaves local_loss REPLICATED (psum'd global value on every
        # device), so per-device autodiff seeds a cotangent of 1 on each of
        # the n copies and psum's transpose (itself a psum) hands every band
        # partial an n x cotangent.  Consequences, group by group:
        #   - point groups + offset (reduce-scattered over the bands): n x
        #     the true gradient -> rescale by 1/n here.  (Adam's first step
        #     is scale-invariant — sign(g) from zero moments — which is why
        #     this was invisible to parameter-parity checks; the
        #     densification stats exposed it.)
        #   - replicated groups (deformation/grid): each device holds n x
        #     its own shard's partial grad, so pmean = psum/n recovers the
        #     exact total.
        inv_n = 1.0 / n_dev
        for gname in ggroups:
            if gname in ("deformation", "grid"):
                ggroups[gname] = jax.tree.map(
                    lambda g: jax.lax.pmean(g, AXIS), ggroups[gname])
            else:
                ggroups[gname] = jax.tree.map(
                    lambda g: g * inv_n, ggroups[gname])
        goffset = goffset * inv_n

        grad_ndc = goffset * jnp.array([width * 0.5, height * 0.5])
        aux = G.add_densification_stats(state.gauss.aux, grad_ndc, radii)

        lrs = group_lrs(opt_cfg, spatial_lr_scale, iteration)
        alive_mask = {g: aux.alive for g in POINT_GROUPS}
        new_groups, new_adam = adam_step(groups, ggroups, state.adam, lrs,
                                         update_mask=alive_mask)
        params, deform = _from_groups(new_groups, statics)
        new_state = TrainState(
            gauss=G.GaussianState(params=params, aux=aux),
            deform=deform, adam=new_adam, rng=state.rng)
        metrics = {"loss": loss, "l1": ll1, "psnr": psnr,
                   "points": jax.lax.psum(jnp.sum(aux.alive), AXIS),
                   "overflow": jax.lax.pmax(overflow, AXIS)}
        return new_state, metrics

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    pt = P(AXIS)
    rep = P()

    def state_specs(state: TrainState):
        cap = state.gauss.capacity

        def spec(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
                return pt
            return rep
        return jax.tree.map(spec, state)

    def build(state_template: TrainState):
        if dp_axis is None:
            cam_spec, gts_spec = rep, P(AXIS)
        else:
            cam_spec, gts_spec = P(dp_axis), P(dp_axis, AXIS)
        in_specs = (state_specs(state_template), cam_spec, gts_spec, rep,
                    rep)
        out_specs = (state_specs(state_template), rep)
        kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
        try:
            smapped = shard_map(sharded_step, check_vma=False, **kwargs)
        except TypeError:
            smapped = shard_map(sharded_step, check_rep=False, **kwargs)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, cam, gts, iteration, sh_degree):
            return smapped(state, cam, gts, iteration, sh_degree)
        return step

    return build, band_h, hpad


def pad_gt_rows(gt: np.ndarray, hpad: int) -> np.ndarray:
    """(H, W, 3) uint8 -> (hpad, W, 3) for row-sharding."""
    out = np.zeros((hpad,) + gt.shape[1:], gt.dtype)
    out[:gt.shape[0]] = gt
    return out


# ---------------------------------------------------------------------------
# sharded structural ops (VERDICT r2 #4)
#
# densify/prune/opacity-reset are SHARD-LOCAL by construction: the fixed-
# capacity design's free-slot search, masked scatters and Adam-moment
# zeroing (models/gaussians.py, train/optim.py) only ever index the local
# point range, so running them on each device's shard inside shard_map IS
# the sharded op — a point-sharded run never gathers the full model around
# a structural iteration.  The only cross-shard touches: a psum for the
# global alive count (host schedule input) and a per-shard RNG fold for the
# split noise.  Deviation vs the replicated path (documented): each shard
# allocates clone/split children from ITS OWN free-slot pool, so a shard
# can locally saturate while another has room; with pick_capacity's ~25%
# headroom per shard this matches the reference's global cap behavior in
# practice (reference semantics: gaussian_model.py:424-509).

def make_ps_structural_ops(mesh: Mesh, state_template: TrainState):
    """Build jitted shard_mapped (densify, prune, reset_opacity) ops.

    Each takes/returns the SHARDED TrainState (same layout as the train
    step) and runs the structural scatter on every shard in parallel."""
    from ..train.loop import _params_by_group  # noqa: F401  (layout docs)
    from ..train.optim import zero_moments_rows

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    pt = P(AXIS)
    rep = P()
    cap = state_template.gauss.capacity

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
            return pt
        return rep

    st_specs = jax.tree.map(spec, state_template)

    def _smap(fn, n_scalars):
        kwargs = dict(mesh=mesh,
                      in_specs=(st_specs,) + (rep,) * n_scalars,
                      out_specs=(st_specs, rep))
        try:
            return shard_map(fn, check_vma=False, **kwargs)
        except TypeError:
            return shard_map(fn, check_rep=False, **kwargs)

    def _densify(state, grad_threshold, percent_dense, scene_extent):
        key, sub = jax.random.split(state.rng)
        sub = jax.random.fold_in(sub, jax.lax.axis_index(AXIS))
        new_gauss, touched = G.densify(state.gauss, grad_threshold,
                                       percent_dense, scene_extent, sub)
        adam = zero_moments_rows(state.adam, POINT_GROUPS, touched)
        n_alive = jax.lax.psum(jnp.sum(new_gauss.aux.alive), AXIS)
        return state._replace(gauss=new_gauss, adam=adam, rng=key), n_alive

    def _prune(state, min_opacity, scene_extent, size_threshold):
        # size_threshold < 0 disables the size test (traced scalar so one
        # compiled program covers both schedule branches)
        use_size = size_threshold >= 0
        params, aux = state.gauss
        opac = jax.nn.sigmoid(params.opacity)[:, 0]
        mask = opac < min_opacity
        big_vs = aux.max_radii2d > size_threshold
        big_ws = jnp.max(jnp.exp(params.scaling), axis=-1) > 0.1 * scene_extent
        mask = mask | (use_size & (big_vs | big_ws))
        kill = mask & aux.alive
        new_params = params._replace(
            scaling=jnp.where(kill[:, None], G.DEAD_SCALE, params.scaling),
            opacity=jnp.where(kill[:, None], G.DEAD_OPACITY, params.opacity))
        new_aux = aux._replace(alive=aux.alive & jnp.logical_not(kill))
        adam = zero_moments_rows(state.adam, POINT_GROUPS, kill)
        new_gauss = G.GaussianState(new_params, new_aux)
        n_alive = jax.lax.psum(jnp.sum(new_aux.alive), AXIS)
        return state._replace(gauss=new_gauss, adam=adam), n_alive

    def _reset(state, _unused):
        params = G.reset_opacity(state.gauss.params)
        all_rows = jnp.ones(state.gauss.params.xyz.shape[0], bool)
        adam = zero_moments_rows(state.adam, ("opacity",), all_rows)
        new_state = state._replace(
            gauss=state.gauss._replace(params=params), adam=adam)
        return new_state, jax.lax.psum(jnp.sum(state.gauss.aux.alive), AXIS)

    densify_op = jax.jit(_smap(_densify, 3), donate_argnums=(0,))
    prune_op = jax.jit(_smap(_prune, 3), donate_argnums=(0,))
    reset_op = jax.jit(_smap(_reset, 1), donate_argnums=(0,))
    return densify_op, prune_op, reset_op
