"""Per-group Adam with exponential LR schedules and moment masking.

Replaces the reference's torch.optim.Adam(param_groups, eps=1e-15)
(gaussian_model.py:190-221) with a hand-rolled functional Adam so that
densify/prune moment surgery is a masked in-place update instead of tensor
reallocation.  Update rule matches torch Adam exactly (bias-corrected,
eps added after sqrt).

Groups (names as in gaussian_model.py:197-207):
  xyz, deformation (MLP), grid (HexPlane), f_dc, f_rest, opacity, scaling,
  rotation.  LR schedules: expon decay for xyz/deformation/grid
  (gaussian_model.py:210-221 — grid's delay_mult comes from deformation's,
  reproduced); constant for the rest.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.general import expon_lr

BETA1, BETA2 = 0.9, 0.999
EPS = 1e-15


class AdamState(NamedTuple):
    m: dict      # same tree structure as params
    v: dict
    step: jnp.ndarray   # () int32


def init_adam(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def group_lrs(opt_cfg, spatial_lr_scale: float, iteration):
    """Per-group learning rates at ``iteration`` (traced ok).  Mirrors
    training_setup + update_learning_rate (gaussian_model.py:190-298)."""
    s = spatial_lr_scale
    return {
        "xyz": expon_lr(iteration, opt_cfg.position_lr_init * s,
                        opt_cfg.position_lr_final * s,
                        lr_delay_mult=opt_cfg.position_lr_delay_mult,
                        max_steps=opt_cfg.position_lr_max_steps),
        "deformation": expon_lr(iteration, opt_cfg.deformation_lr_init * s,
                                opt_cfg.deformation_lr_final * s,
                                lr_delay_mult=opt_cfg.deformation_lr_delay_mult,
                                max_steps=opt_cfg.position_lr_max_steps),
        "grid": expon_lr(iteration, opt_cfg.grid_lr_init * s,
                         opt_cfg.grid_lr_final * s,
                         lr_delay_mult=opt_cfg.deformation_lr_delay_mult,
                         max_steps=opt_cfg.position_lr_max_steps),
        "f_dc": opt_cfg.feature_lr,
        "f_rest": opt_cfg.feature_lr / 20.0,
        "opacity": opt_cfg.opacity_lr,
        "scaling": opt_cfg.scaling_lr,
        "rotation": opt_cfg.rotation_lr,
    }


def adam_step(params: dict, grads: dict, state: AdamState, lrs: dict,
              update_mask: dict | None = None):
    """params/grads: {group_name: pytree}.  lrs: {group_name: scalar}.
    update_mask (optional): {group_name: (C,) bool} row mask (alive points)
    — rows outside the mask receive no update and no moment decay."""
    step = state.step + 1
    bc1 = 1.0 - BETA1 ** step.astype(jnp.float32)
    bc2 = 1.0 - BETA2 ** step.astype(jnp.float32)

    def upd(group):
        lr = lrs[group]
        mask = None if update_mask is None else update_mask.get(group)

        def leaf(p, g, m, v):
            new_m = BETA1 * m + (1 - BETA1) * g
            new_v = BETA2 * v + (1 - BETA2) * (g * g)
            delta = lr * (new_m / bc1) / (jnp.sqrt(new_v / bc2) + EPS)
            new_p = p - delta
            if mask is not None:
                mk = mask.reshape((-1,) + (1,) * (p.ndim - 1))
                new_p = jnp.where(mk, new_p, p)
                new_m = jnp.where(mk, new_m, m)
                new_v = jnp.where(mk, new_v, v)
            return new_p, new_m, new_v

        return leaf

    new_params, new_m, new_v = {}, {}, {}
    for group in params:
        f = upd(group)
        out = jax.tree.map(f, params[group], grads[group],
                           state.m[group], state.v[group])
        # out is a tree of 3-tuples; unzip
        new_params[group] = jax.tree.map(lambda t: t[0], out,
                                         is_leaf=lambda t: isinstance(t, tuple))
        new_m[group] = jax.tree.map(lambda t: t[1], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
        new_v[group] = jax.tree.map(lambda t: t[2], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
    return new_params, AdamState(m=new_m, v=new_v, step=step)


def zero_moments_rows(state: AdamState, point_groups: tuple, mask) -> AdamState:
    """Zero Adam moments of masked rows for the per-point groups — the
    equivalent of the reference's state surgery on densify/prune
    (gaussian_model.py:430-431, 470-471)."""
    def zero_group(tree):
        def z(x):
            mk = mask.reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.where(mk, 0.0, x)
        return jax.tree.map(z, tree)

    new_m = dict(state.m)
    new_v = dict(state.v)
    for g in point_groups:
        new_m[g] = zero_group(new_m[g])
        new_v[g] = zero_group(new_v[g])
    return AdamState(m=new_m, v=new_v, step=state.step)


POINT_GROUPS = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")
