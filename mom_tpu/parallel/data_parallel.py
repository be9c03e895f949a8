"""Multi-chip data-parallel training over a camera batch.

The reference is single-process/single-GPU (SURVEY.md §2.5); the TPU-native
scaling axis for this workload is views/frames per step, which is
embarrassingly parallel.  Design:

- 1D device mesh ("data",): Gaussian/deformation parameters and optimizer
  state replicated, the per-step camera batch + GT images sharded
- inside shard_map each device renders ITS camera with the full unbatched
  program (so the Pallas kernels never need a vmap rule), computes local
  grads, and a psum over "data" averages them — gradients ride the ICI
- the Adam update then runs replicated (identical on every chip)

This is exactly a larger-batch version of the reference's accumulation over
viewpoint_cams (train_4DGS.py:189-229) — the per-view loss mean matches its
image_tensor concat + joint L1.
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
from ..render import render
from ..train import losses
from ..train.loop import (TrainState, _params_by_group, _from_groups,
                          _deform_statics)
from ..train.optim import group_lrs, adam_step, POINT_GROUPS


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def make_dp_train_step(mesh: Mesh, opt_cfg, hidden_cfg, deform_cfg,
                       width: int, height: int, stage: str,
                       spatial_lr_scale: float, bg,
                       key_cap: int | None = None, backend: str = "tiled"):
    """Jitted data-parallel step: camera batch size == mesh size."""
    n_dev = mesh.devices.size
    bgj = jnp.asarray(bg, jnp.float32)
    use_tv = stage == "fine" and hidden_cfg.time_smoothness_weight != 0
    use_ssim = opt_cfg.lambda_dssim != 0

    def local_loss(groups, statics, aux, cam, gt, sh_degree, offset):
        params, deform = _from_groups(groups, statics)
        out = render(params, aux, deform, deform_cfg, cam, width, height,
                     bgj, stage=stage, active_sh_degree=sh_degree,
                     delta_scale=1.0, means2d_offset=offset,
                     key_cap=key_cap, backend=backend)
        gtf = gt.astype(jnp.float32) / 255.0
        ll1 = losses.l1_loss(out.color, gtf)
        loss = ll1
        if use_tv:
            loss = loss + grid_regularization(
                deform["grid"], hidden_cfg.time_smoothness_weight,
                hidden_cfg.l1_time_planes, hidden_cfg.plane_tv_weight)
        if use_ssim:
            loss = loss + opt_cfg.lambda_dssim * (1 - losses.ssim(out.color,
                                                                  gtf))
        return loss, (ll1, losses.psnr(out.color, gtf), out.radii)

    def sharded_step(state: TrainState, cams: dict, gts: jnp.ndarray,
                     iteration, sh_degree):
        # runs per device under shard_map: cams/gts leaves have a leading
        # axis of 1 (this device's shard)
        groups = _params_by_group(state.gauss.params, state.deform)
        statics = _deform_statics(state.deform)
        C = state.gauss.capacity
        offset = jnp.zeros((C, 2), jnp.float32)
        cam0 = jax.tree.map(lambda a: a[0], cams)
        gt0 = gts[0]

        (loss, (ll1, psnr, radii)), grads = jax.value_and_grad(
            local_loss, argnums=(0, 6), has_aux=True)(
            groups, statics, state.gauss.aux, cam0, gt0, sh_degree, offset)
        ggroups, goffset = grads

        # average over the data axis (ICI all-reduce)
        ggroups = jax.tree.map(
            lambda g: jax.lax.pmean(g, "data"), ggroups)
        loss = jax.lax.pmean(loss, "data")
        ll1 = jax.lax.pmean(ll1, "data")
        psnr = jax.lax.pmean(psnr, "data")
        # densification stats: the reference SUMS the batch's viewspace
        # grads (train_4DGS.py:203-204, 227-229) — but its batch loss is a
        # mean over views, so each summand already carries a 1/nb factor
        # (see train/loop.py's replicated batched step).  The per-view DP
        # loss lacks that factor, so the matching reduction here is pmean,
        # not psum; radii take the batch max.
        goffset = jax.lax.pmean(goffset, "data")
        radii = jax.lax.pmax(radii, "data")

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
                   "points": jnp.sum(aux.alive)}
        return new_state, metrics

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    replicated = P()
    data = P("data")
    kwargs = dict(mesh=mesh,
                  in_specs=(replicated, data, data, replicated, replicated),
                  out_specs=(replicated, replicated))
    try:
        smapped = shard_map(sharded_step, check_vma=False, **kwargs)
    except TypeError:
        smapped = shard_map(sharded_step, check_rep=False, **kwargs)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, cams, gts, iteration, sh_degree):
        return smapped(state, cams, gts, iteration, sh_degree)

    return step, n_dev
