"""Two-stage 4DGS training loop — the jit-native equivalent of
scene_reconstruction (train_4DGS.py:48-301).

Host side keeps only the iteration schedule (densify/prune/opacity-reset
cadence, viewpoint shuffling, checkpoint triggers); everything per-iteration
runs in three jitted programs over fixed-shape state:

  train_step       render -> loss -> grads -> stats -> Adam on all groups
  train_step_frozen  same but skipping the point-group Adam update — used on
                   structural iterations, reproducing the reference quirk
                   that densify/prune/opacity-reset reallocate the params so
                   torch sees grad=None and skips them that iteration
  densify_op / prune_op / reset_opacity_op   structural masked scatters

The per-iteration order matches train_4DGS.py:189-301: forward/backward,
stats accumulation, structural ops, optimizer step.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..models import deformation as D
from ..models.hexplane import grid_regularization
from ..render import render
from . import losses
from .optim import (AdamState, init_adam, group_lrs, adam_step,
                    zero_moments_rows, POINT_GROUPS)


class TrainState(NamedTuple):
    gauss: G.GaussianState
    deform: dict
    adam: AdamState
    rng: jnp.ndarray


def _params_by_group(params: G.GaussianParams, deform: dict) -> dict:
    # the grid group excludes the (non-trainable) aabb, mirroring
    # requires_grad=False on HexPlaneField.aabb (scene/hexplane.py:120);
    # the empty_voxel DenseGrid joins the grid group (its torch name
    # 'empty_voxel.grid' contains 'grid', deformation.py:160-165)
    grid_group = deform["grid"]["grids"]
    if "empty_voxel" in deform:
        grid_group = {"hex": grid_group, "voxel": deform["empty_voxel"]["grid"]}
    return {
        "xyz": params.xyz,
        "f_dc": params.features_dc,
        "f_rest": params.features_rest,
        "opacity": params.opacity,
        "scaling": params.scaling,
        "rotation": params.rotation,
        "deformation": D.mlp_param_tree(deform),
        "grid": grid_group,
    }


def _deform_statics(deform: dict) -> dict:
    """Non-trainable deformation buffers threaded around the grad."""
    statics = {"aabb": deform["grid"]["aabb"]}
    if "empty_voxel" in deform:
        statics["ev_xyz_max"] = deform["empty_voxel"]["xyz_max"]
        statics["ev_xyz_min"] = deform["empty_voxel"]["xyz_min"]
    return statics


def _from_groups(g: dict, statics: dict) -> tuple:
    params = G.GaussianParams(
        xyz=g["xyz"], features_dc=g["f_dc"], features_rest=g["f_rest"],
        scaling=g["scaling"], rotation=g["rotation"], opacity=g["opacity"])
    deform = dict(g["deformation"])
    gg = g["grid"]
    if isinstance(gg, dict):
        deform["grid"] = {"grids": gg["hex"], "aabb": statics["aabb"]}
        deform["empty_voxel"] = {"grid": gg["voxel"],
                                 "xyz_max": statics["ev_xyz_max"],
                                 "xyz_min": statics["ev_xyz_min"]}
    else:
        deform["grid"] = {"grids": gg, "aabb": statics["aabb"]}
    return params, deform


def make_train_step(opt_cfg, hidden_cfg, deform_cfg: D.DeformConfig,
                    width: int, height: int, stage: str,
                    spatial_lr_scale: float, bg,
                    key_cap: int | None = None, backend: str = "tiled",
                    batch_size: int = 1):
    """Build the jitted per-iteration step.  ``freeze_points`` (traced bool)
    reproduces the torch grad=None skip on structural iterations."""
    bgj = jnp.asarray(bg, jnp.float32)
    use_ssim = opt_cfg.lambda_dssim != 0
    use_tv = stage == "fine" and hidden_cfg.time_smoothness_weight != 0
    lambda_lpips = getattr(opt_cfg, "lambda_lpips", 0)
    lpips_params = None
    if lambda_lpips != 0:
        from . import lpips as LP
        lpips_params = LP.load_lpips(getattr(opt_cfg, "lpips_ckpt", None))

    def loss_fn(groups, statics, aux, cams, gts, sh_degree, offset):
        params, deform = _from_groups(groups, statics)

        def render_one(cam, off):
            return render(params, aux, deform, deform_cfg, cam, width, height,
                          bgj, stage=stage, active_sh_degree=sh_degree,
                          delta_scale=1.0, means2d_offset=off,
                          key_cap=key_cap, backend=backend)

        if batch_size == 1:
            cam0 = jax.tree.map(lambda a: a[0], cams)
            out = render_one(cam0, offset[0])
            color = out.color[None]
            radii = out.radii[None]
            overflow = out.overflow
            instances = out.instances
        else:
            out = jax.vmap(render_one)(cams, offset)
            color = out.color
            radii = out.radii
            overflow = jnp.max(out.overflow)
            instances = jnp.max(out.instances)

        gt = gts.astype(jnp.float32) / 255.0
        ll1 = losses.l1_loss(color, gt)
        loss = ll1
        if use_tv:
            loss = loss + grid_regularization(
                deform["grid"], hidden_cfg.time_smoothness_weight,
                hidden_cfg.l1_time_planes, hidden_cfg.plane_tv_weight)
        if use_ssim:
            loss = loss + opt_cfg.lambda_dssim * (1.0 - losses.ssim(color, gt))
        if lpips_params is not None:
            from . import lpips as LP
            loss = loss + lambda_lpips * LP.lpips_distance(lpips_params,
                                                           color, gt)
        aux_out = (ll1, losses.psnr(color, gt), radii, overflow,
                   instances)
        return loss, aux_out

    def _body(state: TrainState, cams: dict, gts: jnp.ndarray,
              iteration, sh_degree, freeze_points: bool = False):
        groups = _params_by_group(state.gauss.params, state.deform)
        nb = batch_size
        C = state.gauss.capacity
        offset = jnp.zeros((nb, C, 2), jnp.float32)

        statics = _deform_statics(state.deform)
        (loss, (ll1, psnr, radii, overflow, instances)), grads = \
            jax.value_and_grad(
            loss_fn, argnums=(0, 6), has_aux=True)(
            groups, statics, state.gauss.aux, cams, gts, sh_degree, offset)
        ggroups, goffset = grads

        # densification stats: viewspace grad in NDC units, max over batch
        # radii / any-visibility (train_4DGS.py:203-204, 227-229)
        grad_pix = jnp.sum(goffset, axis=0)               # (C, 2)
        grad_ndc = grad_pix * jnp.array([width * 0.5, height * 0.5])
        radii_max = jnp.max(radii, axis=0)
        aux = G.add_densification_stats(state.gauss.aux, grad_ndc, radii_max)

        lrs = group_lrs(opt_cfg, spatial_lr_scale, iteration)
        # freeze: params AND moments untouched for point groups, matching the
        # torch grad=None skip after tensor reallocation
        row_mask = (jnp.zeros_like(aux.alive) if freeze_points else aux.alive)
        alive_mask = {g: row_mask for g in POINT_GROUPS}
        new_groups, new_adam = adam_step(groups, ggroups, state.adam, lrs,
                                         update_mask=alive_mask)
        params, deform = _from_groups(new_groups, statics)
        new_state = TrainState(
            gauss=G.GaussianState(params=params, aux=aux),
            deform=deform, adam=new_adam, rng=state.rng)
        metrics = {"loss": loss, "l1": ll1, "psnr": psnr,
                   "points": jnp.sum(aux.alive), "overflow": overflow,
                   "instances": instances}
        return new_state, metrics

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("freeze_points",))
    def step(state: TrainState, cams: dict, gts: jnp.ndarray,
             iteration, sh_degree, freeze_points: bool = False):
        return _body(state, cams, gts, iteration, sh_degree, freeze_points)

    step.body = _body
    return step


def make_chunked_steps(step, k: int, batch_size: int = 1):
    """Dispatch-minimal training programs over a DEVICE-RESIDENT view set.

    A remote-TPU tunnel charges a round-trip per dispatched executable, and
    at production scale that latency — not compute — was setting the
    training rate (observed: step time invariant to a 4.4x capacity
    shrink AND to removing the per-step GT upload).  These two programs
    reduce the loop to ~4 dispatches per 100 iterations:

      multistep(state, cams_all, gts_all, view_idx[k], iter0, sh_degree)
          -> (state, losses[k])  — k iterations as ONE lax.scan program,
             the sampled view sliced on device per scan step;
      step1(state, cams_all, gts_all, vi, iteration, sh_degree,
            freeze_points) -> (state, metrics) — a single iteration with
             the same on-device view pick (boundary/structural iterations
             and mid-chunk resume alignment).

    Identical math to ``step`` — the scan replays the same body, so k
    chained iterations match k single-step calls bit-for-bit.

    MOM_TPU_SCAN_UNROLL=n replicates the scan body n times per loop trip
    (lax.scan unroll): the XLA while-loop's per-trip overhead and the
    fusion barrier at the trip boundary are the prime suspects for the
    bench's scan-batched rate trailing single-step by ~1% (BENCH_r04) —
    unrolling amortizes both without changing the math (unroll>1 lets XLA
    fuse across adjacent iterations, which can reassociate float reductions
    — mathematically identical, not bit-identical; the default 1 keeps the
    bit-parity the multistep test pins)."""
    body = step.body
    unroll = max(1, int(os.environ.get("MOM_TPU_SCAN_UNROLL", "1") or 1))

    def _slice_view(cams_all, gts_all, vi):
        """vi: scalar index at batch_size 1 (dynamic_slice keeps the old
        signature/compile); an (nb,) index vector otherwise (reference
        batching samples nb views per iteration, train_4DGS.py:172-176)."""
        if batch_size == 1:
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, vi, 1)  # noqa: E731
        else:
            sl = lambda a: jnp.take(a, vi, axis=0)                 # noqa: E731
        return jax.tree.map(sl, cams_all), sl(gts_all)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multistep(state: TrainState, cams_all: dict, gts_all, view_idx,
                  iter0, sh_degree):
        def scan_body(st, inp):
            di, vi = inp
            camb, gtb = _slice_view(cams_all, gts_all, vi)
            st2, m = body(st, camb, gtb, iter0 + di, sh_degree, False)
            return st2, m["loss"]
        xs = (jnp.arange(k, dtype=jnp.float32), view_idx)
        state, losses = jax.lax.scan(scan_body, state, xs,
                                     unroll=min(unroll, k))
        return state, losses

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("freeze_points",))
    def step1(state: TrainState, cams_all: dict, gts_all, vi, iteration,
              sh_degree, freeze_points: bool = False):
        camb, gtb = _slice_view(cams_all, gts_all, vi)
        return body(state, camb, gtb, iteration, sh_degree, freeze_points)

    return multistep, step1


@functools.partial(jax.jit, donate_argnums=(0,))
def densify_op(state: TrainState, grad_threshold, percent_dense,
               scene_extent):
    key, sub = jax.random.split(state.rng)
    new_gauss, touched = G.densify(state.gauss, grad_threshold, percent_dense,
                                   scene_extent, sub)
    adam = zero_moments_rows(state.adam, POINT_GROUPS, touched)
    return state._replace(gauss=new_gauss, adam=adam, rng=key)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("use_size",))
def prune_op(state: TrainState, min_opacity, scene_extent, size_threshold,
             use_size: bool):
    new_gauss, killed = G.prune(state.gauss, min_opacity, scene_extent,
                                size_threshold if use_size else None)
    adam = zero_moments_rows(state.adam, POINT_GROUPS, killed)
    return state._replace(gauss=new_gauss, adam=adam)


@functools.partial(jax.jit, donate_argnums=(0,))
def reset_opacity_op(state: TrainState):
    params = G.reset_opacity(state.gauss.params)
    # replace_tensor_to_optimizer zeroes the whole opacity state
    # (gaussian_model.py:409-422)
    all_rows = jnp.ones(state.gauss.capacity, bool)
    adam = zero_moments_rows(state.adam, ("opacity",), all_rows)
    return state._replace(
        gauss=state.gauss._replace(params=params), adam=adam)


class Schedule:
    """Host-side iteration schedule for one stage
    (train_4DGS.py:149-290)."""

    def __init__(self, opt_cfg, stage: str):
        self.opt = opt_cfg
        self.stage = stage

    def thresholds(self, iteration):
        o = self.opt
        if self.stage == "coarse":
            return o.opacity_threshold_coarse, o.densify_grad_threshold_coarse
        opac = (o.opacity_threshold_fine_init
                - iteration * (o.opacity_threshold_fine_init
                               - o.opacity_threshold_fine_after)
                / o.densify_until_iter)
        dens = (o.densify_grad_threshold_fine_init
                - iteration * (o.densify_grad_threshold_fine_init
                               - o.densify_grad_threshold_after)
                / o.densify_until_iter)
        return opac, dens

    def structural_actions(self, iteration, num_alive):
        """(do_densify, do_prune, do_reset) for this iteration."""
        o = self.opt
        if iteration >= o.densify_until_iter:
            return False, False, False
        do_densify = (iteration > o.densify_from_iter
                      and iteration % o.densification_interval == 0
                      and num_alive < o.max_gaussians)
        do_prune = (iteration > o.pruning_from_iter
                    and iteration % o.pruning_interval == 0
                    and num_alive > o.min_gaussians_for_prune)
        do_reset = iteration % o.opacity_reset_interval == 0
        return do_densify, do_prune, do_reset

    def size_threshold(self, iteration):
        return 20.0 if iteration > self.opt.opacity_reset_interval else None


class ViewpointSampler:
    """Random-pop-without-replacement viewpoint sampling
    (train_4DGS.py:168-179) with a numpy RNG."""

    def __init__(self, n: int, seed: int = 6666):
        self.n = n
        self.rng = np.random.RandomState(seed)
        self.stack = list(range(n))

    def next(self) -> int:
        if not self.stack:
            self.stack = list(range(self.n))
        idx = self.rng.randint(0, len(self.stack))
        return self.stack.pop(idx)
