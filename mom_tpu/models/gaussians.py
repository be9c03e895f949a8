"""Fixed-capacity Gaussian parameter store with jit-safe densify/prune.

TPU-native redesign of the reference GaussianModel (scene/gaussian_model.py).
The reference reallocates every parameter tensor *and* the Adam state on each
densify/prune (gaussian_model.py:424-509) — a retrace per step under XLA.
Here all point arrays have a static ``capacity`` and an ``alive`` mask;
densify/prune are masked scatters that run inside jit with zero retraces:

- dead slots keep safe parameter values and are excluded from rasterization
  via the preprocess alive_mask (ops/preprocess.py)
- clone/split write into free slots located with a stable argsort of the
  alive mask; suppressed writes are routed out-of-bounds and dropped
- Adam moments of (re)claimed slots are zeroed exactly like
  cat_tensors_to_optimizer does (gaussian_model.py:470-471) via the returned
  ``touched`` mask; prune kills rows like _prune_optimizer's row removal
  (gaussian_model.py:424-442)

Activation conventions match the reference (gaussian_model.py:30-46):
exp scales, sigmoid opacity, L2-normalized quaternions.
"""

from __future__ import annotations

import sys as _sys
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import mean_3nn_sq_dist, mean_3nn_sq_dist_morton
from ..utils.sh import rgb2sh
from ..utils.general import inverse_sigmoid_np

DEAD_XYZ = 0.0
DEAD_SCALE = -20.0       # exp(-20) ~ 2e-9: invisible even if a mask slips
DEAD_OPACITY = -20.0


class GaussianParams(NamedTuple):
    """Trainable per-point parameters (raw / pre-activation)."""
    xyz: jnp.ndarray            # (C, 3)
    features_dc: jnp.ndarray    # (C, 1, 3)
    features_rest: jnp.ndarray  # (C, 15, 3)
    scaling: jnp.ndarray        # (C, 3)  log-scale
    rotation: jnp.ndarray       # (C, 4)  unnormalized quat wxyz
    opacity: jnp.ndarray        # (C, 1)  logit


class GaussianAux(NamedTuple):
    """Non-trainable per-point state."""
    alive: jnp.ndarray               # (C,) bool
    scene_flow: jnp.ndarray          # (C, 3) — fixed 3D flow (stage-1 output)
    max_radii2d: jnp.ndarray         # (C,)
    xyz_gradient_accum: jnp.ndarray  # (C,)
    denom: jnp.ndarray               # (C,)
    deformation_accum: jnp.ndarray   # (C, 3)
    deformation_table: jnp.ndarray   # (C,) bool (always True in live path)


class GaussianState(NamedTuple):
    params: GaussianParams
    aux: GaussianAux

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    @property
    def num_alive(self):
        return jnp.sum(self.aux.alive)


def activated(params: GaussianParams):
    """(scales, rotations, opacities) after activation."""
    scales = jnp.exp(params.scaling)
    rot = params.rotation / jnp.maximum(
        jnp.linalg.norm(params.rotation, axis=-1, keepdims=True), 1e-12)
    opac = jax.nn.sigmoid(params.opacity)
    return scales, rot, opac


def get_features(params: GaussianParams) -> jnp.ndarray:
    """(C, 16, 3) concatenated SH coefficients (gaussian_model.py:136-140)."""
    return jnp.concatenate([params.features_dc, params.features_rest], axis=1)


def create_from_pcd(points: np.ndarray, colors: np.ndarray,
                    scene_flow: np.ndarray, flow_scale: float,
                    capacity: int) -> GaussianState:
    """Mirror of create_from_pcd (gaussian_model.py:153-187): SH-DC colors,
    log(sqrt(mean 3-NN sq dist)) isotropic scales, identity quats, opacity
    logit of 0.1, scene_flow scaled by flow_scale."""
    n = points.shape[0]
    assert n <= capacity, (n, capacity)
    # reference's init banner (gaussian_model.py:156) — stderr so scripts
    # with machine-readable stdout (bench.py's single JSON line) stay clean
    print(f"Number of points at initialisation : {n}",
          file=_sys.stderr, flush=True)

    if n > 200_000:
        # Morton-window approximation for big clouds — the reference's
        # simple-knn is itself a Morton box search (simple_knn.cu:147-183).
        # The native C++ path runs in <1s at ~1M points where the jitted
        # device version costs minutes of compile+transfer through a remote
        # tunnel; the points are host-resident numpy here anyway.
        from .. import native
        dist2 = native.knn3_morton(np.ascontiguousarray(points, np.float32),
                                   window=24)
        if dist2 is None:
            dist2 = np.asarray(mean_3nn_sq_dist_morton(
                jnp.asarray(points, jnp.float32)))
    else:
        dist2 = np.asarray(mean_3nn_sq_dist(jnp.asarray(points, jnp.float32)))
    dist2 = np.clip(dist2, 1e-7, None)
    scales = np.repeat(np.log(np.sqrt(dist2))[:, None], 3, axis=1)

    def padded(x, fill):
        out = np.full((capacity,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    fdc = rgb2sh(np.asarray(colors, np.float32)).reshape(n, 1, 3)
    rots = np.zeros((capacity, 4), np.float32)
    rots[:, 0] = 1.0

    params = GaussianParams(
        xyz=padded(np.asarray(points, np.float32), DEAD_XYZ),
        features_dc=padded(fdc, 0.0),
        features_rest=padded(np.zeros((n, 15, 3), np.float32), 0.0),
        scaling=padded(scales.astype(np.float32), DEAD_SCALE),
        rotation=jnp.asarray(rots),
        opacity=padded(np.full((n, 1), inverse_sigmoid_np(0.1), np.float32),
                       DEAD_OPACITY),
    )
    alive = jnp.zeros(capacity, bool).at[:n].set(True)
    aux = GaussianAux(
        alive=alive,
        scene_flow=padded(np.asarray(scene_flow, np.float32) * flow_scale, 0.0),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_gradient_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
        deformation_accum=jnp.zeros((capacity, 3), jnp.float32),
        deformation_table=jnp.ones(capacity, bool),
    )
    return GaussianState(params=params, aux=aux)


# ---------------------------------------------------------------------------
# densification statistics (gaussian_model.py:713-715, train_4DGS.py:266-267)

def add_densification_stats(aux: GaussianAux, means2d_grad_ndc: jnp.ndarray,
                            radii: jnp.ndarray) -> GaussianAux:
    """means2d_grad_ndc: (C, 2) gradient of the loss w.r.t. the projected
    means in NDC units (pixel grad * [W/2, H/2] — the scale the CUDA backward
    reports via ddelx_dx = 0.5*W, so the 2e-4 thresholds transfer)."""
    visible = radii > 0
    norm = jnp.linalg.norm(means2d_grad_ndc, axis=-1)
    return aux._replace(
        xyz_gradient_accum=aux.xyz_gradient_accum + jnp.where(visible, norm, 0.0),
        denom=aux.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.where(visible, jnp.maximum(aux.max_radii2d, radii),
                              aux.max_radii2d),
    )


# ---------------------------------------------------------------------------
# densify / prune

def _free_slot_map(alive: jnp.ndarray):
    """(slot_of_rank (C,), num_free): slot_of_rank[r] = index of the r-th
    dead slot in ascending order."""
    C = alive.shape[0]
    order = jnp.argsort(alive, stable=True)        # dead slots first, by index
    num_free = C - jnp.sum(alive)
    return order, num_free


def _put_rows(arr, dest, vals, ok):
    """Scatter vals rows to arr[dest] where ok; suppressed writes go out of
    bounds and are dropped (deterministic — live dests are unique)."""
    C = arr.shape[0]
    safe_dest = jnp.where(ok, dest, C)
    return arr.at[safe_dest].set(vals, mode="drop")


def _scatter_new_points(params: GaussianParams, aux: GaussianAux,
                        new_vals: dict, dest: jnp.ndarray, ok: jnp.ndarray):
    new_params = GaussianParams(
        xyz=_put_rows(params.xyz, dest, new_vals["xyz"], ok),
        features_dc=_put_rows(params.features_dc, dest,
                              new_vals["features_dc"], ok),
        features_rest=_put_rows(params.features_rest, dest,
                                new_vals["features_rest"], ok),
        scaling=_put_rows(params.scaling, dest, new_vals["scaling"], ok),
        rotation=_put_rows(params.rotation, dest, new_vals["rotation"], ok),
        opacity=_put_rows(params.opacity, dest, new_vals["opacity"], ok),
    )
    new_aux = aux._replace(
        alive=_put_rows(aux.alive, dest, jnp.ones(dest.shape[0], bool), ok),
        scene_flow=_put_rows(aux.scene_flow, dest, new_vals["scene_flow"], ok),
        deformation_table=_put_rows(aux.deformation_table, dest,
                                    jnp.ones(dest.shape[0], bool), ok),
    )
    return new_params, new_aux


def _quat_rotmat_normalized(q):
    from ..ops.preprocess import quat_to_rotmat
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quat_to_rotmat(q / n)


def densify(state: GaussianState, grad_threshold, percent_dense: float,
            scene_extent: float, key):
    """densify_and_clone + densify_and_split (gaussian_model.py:511-581) as
    masked scatters.  Returns (new_state, touched) where ``touched`` marks
    slots whose optimizer moments must be zeroed (new clones, both split
    children including the reused original slot)."""
    params, aux = state
    alive0 = aux.alive
    grads = aux.xyz_gradient_accum / jnp.maximum(aux.denom, 1e-12)
    grads = jnp.where(aux.denom > 0, grads, 0.0)
    scales = jnp.exp(params.scaling)
    max_scale = jnp.max(scales, axis=-1)
    grad_ok = (grads >= grad_threshold) & aux.alive

    base_vals = {
        "xyz": params.xyz, "features_dc": params.features_dc,
        "features_rest": params.features_rest, "scaling": params.scaling,
        "rotation": params.rotation, "opacity": params.opacity,
        "scene_flow": aux.scene_flow,
    }

    # --- clone (small gaussians): exact copy into a free slot
    clone_sel = grad_ok & (max_scale <= percent_dense * scene_extent)
    order, num_free = _free_slot_map(aux.alive)
    rank = jnp.cumsum(clone_sel) - 1
    ok = clone_sel & (rank < num_free)
    dest = order[jnp.clip(rank, 0, state.capacity - 1)]
    params, aux = _scatter_new_points(params, aux, base_vals, dest, ok)

    # --- split (large gaussians): 2 resampled children, original replaced
    split_sel = grad_ok & (max_scale > percent_dense * scene_extent)
    R = _quat_rotmat_normalized(params.rotation)
    new_scaling = jnp.log(jnp.maximum(scales / (0.8 * 2), 1e-20))
    for i in range(2):
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, params.xyz.shape) * scales
        child_xyz = jnp.einsum("nij,nj->ni", R, noise) + base_vals["xyz"]
        vals_i = dict(base_vals)
        vals_i["xyz"] = child_xyz
        vals_i["scaling"] = new_scaling
        if i == 0:
            # first child reuses the original's slot (reference prunes the
            # original and appends 2 children: net +1 slot, same as here)
            dest = jnp.arange(state.capacity)
            ok = split_sel
        else:
            order, num_free = _free_slot_map(aux.alive)
            rank = jnp.cumsum(split_sel) - 1
            ok = split_sel & (rank < num_free)
            dest = order[jnp.clip(rank, 0, state.capacity - 1)]
        params, aux = _scatter_new_points(params, aux, vals_i, dest, ok)

    touched = (aux.alive & jnp.logical_not(alive0)) | split_sel

    # reference resets stats for ALL points after densify
    # (gaussian_model.py:505-508)
    aux = aux._replace(
        xyz_gradient_accum=jnp.zeros_like(aux.xyz_gradient_accum),
        denom=jnp.zeros_like(aux.denom),
        max_radii2d=jnp.zeros_like(aux.max_radii2d),
        deformation_accum=jnp.zeros_like(aux.deformation_accum),
    )
    return GaussianState(params, aux), touched


def prune(state: GaussianState, min_opacity: float, extent: float,
          max_screen_size) -> tuple[GaussianState, jnp.ndarray]:
    """prune (gaussian_model.py:681-692): opacity below threshold; plus big
    points in view/world space when max_screen_size is set.  Returns
    (state, killed) — killed slots' optimizer moments should be zeroed."""
    params, aux = state
    opac = jax.nn.sigmoid(params.opacity)[:, 0]
    mask = opac < min_opacity
    if max_screen_size is not None:
        big_vs = aux.max_radii2d > max_screen_size
        big_ws = jnp.max(jnp.exp(params.scaling), axis=-1) > 0.1 * extent
        mask = mask | big_vs | big_ws
    kill = mask & aux.alive
    new_params = params._replace(
        scaling=jnp.where(kill[:, None], DEAD_SCALE, params.scaling),
        opacity=jnp.where(kill[:, None], DEAD_OPACITY, params.opacity),
    )
    new_aux = aux._replace(alive=aux.alive & jnp.logical_not(kill))
    return GaussianState(new_params, new_aux), kill


def reset_opacity(params: GaussianParams) -> GaussianParams:
    """reset_opacity (gaussian_model.py:362-365): opacity = min(opacity, 0.01)
    in activated space."""
    opac = jax.nn.sigmoid(params.opacity)
    new = jnp.minimum(opac, 0.01)
    logit = jnp.log(new / (1.0 - new))
    return params._replace(opacity=logit)
