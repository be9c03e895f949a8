"""Top-level render function — the equivalent of render()
(gaussian_renderer/__init__.py:22-178), fully jittable.

Order of operations matches the reference exactly:
- coarse stage: raw parameters go straight to the rasterizer (:85-87)
- fine stage: the deformation net consumes RAW (pre-activation) parameters
  and the scene-flow advection term (:101-103)
- activations (exp / normalize / sigmoid) are applied AFTER deformation
  (:130-132)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .models import gaussians as G
from .models import deformation as D
from .ops.rasterize import rasterize_tiled, TiledRenderOutput
from .ops.rasterize_ref import rasterize_reference


class RenderResult(NamedTuple):
    color: jnp.ndarray
    depth: jnp.ndarray
    final_T: jnp.ndarray
    radii: jnp.ndarray
    overflow: jnp.ndarray   # 0 for the oracle backend
    instances: jnp.ndarray = None  # surviving duplicate-key instances (0 oracle)


def _prepare(params: G.GaussianParams, aux: G.GaussianAux,
             deform_params, deform_cfg, cam: dict, width: int, height: int,
             bg, stage: str, active_sh_degree, delta_scale: float,
             scaling_modifier: float, means2d_offset) -> dict:
    """Deform-then-activate prefix shared by render() and
    instance_demand(): returns the rasterizer kwargs dict."""
    means3d = params.xyz
    opacity_raw = params.opacity
    shs = G.get_features(params)
    scales_raw = params.scaling
    rot_raw = params.rotation

    if stage == "coarse":
        means_f, scales_f, rot_f, opac_f, shs_f = (
            means3d, scales_raw, rot_raw, opacity_raw, shs)
    else:
        n = means3d.shape[0]
        times = jnp.broadcast_to(cam["time"], (n,))
        means_f, scales_f, rot_f, opac_f, shs_f = D.deform(
            deform_params, deform_cfg, means3d, scales_raw, rot_raw,
            opacity_raw, shs, times, aux.scene_flow, cam["frame_num"],
            delta_scale, uniform_time=True)

    scales_act = jnp.exp(scales_f) * scaling_modifier
    # torch F.normalize semantics: denominator clamped (a deformed quaternion
    # passing through zero must not emit NaN — reference relies on the same
    # eps, torch.nn.functional.normalize)
    rot_act = rot_f / jnp.maximum(
        jnp.linalg.norm(rot_f, axis=-1, keepdims=True), 1e-12)
    opac_act = jax.nn.sigmoid(opac_f)

    return dict(
        means3d=means_f, scales=scales_act, rotations=rot_act,
        opacities=opac_act[:, 0], shs=shs_f,
        viewmatrix=cam["viewmatrix"], projmatrix=cam["projmatrix"],
        campos=cam["campos"], tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
        width=width, height=height, bg=bg,
        active_sh_degree=active_sh_degree,
        means2d_offset=means2d_offset, alive_mask=aux.alive,
    )


def instance_demand(params: G.GaussianParams, aux: G.GaussianAux,
                    deform_params, deform_cfg, cam: dict,
                    width: int, height: int,
                    stage: str = "fine", active_sh_degree=3,
                    delta_scale: float = 1.0,
                    bands: int = 1) -> jnp.ndarray:
    """Exact duplicate-key instance demand of one view: the total tile-rect
    area of the alive gaussians — the number the reference discovers via
    its InclusiveSum over per-gaussian touched-tile counts
    (rasterizer_impl.cu:278-315) before allocating the key buffer.

    A key_cap >= this value renders the view with zero overflow (the
    quantity bin_gaussians reports as instances + overflow, ops/
    rasterize.py).  Costs deform + preprocess only — no sort, no
    compositing — so a scan over a whole trajectory is cheap; render_sets
    uses it to size each trajectory's key_cap instead of guessing a blanket
    multiplier (round-4 postmortem: a guess too low silently blacks out the
    far field, one high enough for the worst case slows every other
    trajectory's compositing grid)."""
    from .ops.preprocess import preprocess
    from .ops.rasterize import tile_rect

    common = _prepare(params, aux, deform_params, deform_cfg, cam,
                      width, height, jnp.zeros(3, jnp.float32), stage,
                      active_sh_degree, delta_scale, 1.0, None)
    for k in ("bg", "width", "height"):
        common.pop(k)
    pre = preprocess(**common, width=width, height=height)
    alive = pre.valid & (pre.radii > 0)
    rmn, rmx = tile_rect(pre.means2d, pre.radii, width, height)
    rw = (rmx[:, 0] - rmn[:, 0]).astype(jnp.int32)
    rh = (rmx[:, 1] - rmn[:, 1]).astype(jnp.int32)
    if bands > 1:
        # per-tile-row-band demand in the same pass: a band's demand is the
        # rect rows clamped to that band (exactly bin_gaussians' row_tiles
        # clamp), so a banded render sized from this vector overflows iff
        # the whole-image render would
        from .ops.rasterize import TILE
        gy_full = (height + TILE - 1) // TILE
        bounds = [round(b * gy_full / bands) for b in range(bands + 1)]
        out = []
        for b in range(bands):
            mny = jnp.clip(rmn[:, 1], bounds[b], bounds[b + 1])
            mxy = jnp.clip(rmx[:, 1], bounds[b], bounds[b + 1])
            rh_b = (mxy - mny).astype(jnp.int32)
            out.append(jnp.sum(jnp.where(alive, rw * rh_b, 0)
                               .astype(jnp.int32)))
        return jnp.stack(out)
    return jnp.sum(jnp.where(alive, rw * rh, 0).astype(jnp.int32))


def render(params: G.GaussianParams, aux: G.GaussianAux,
           deform_params: dict | None, deform_cfg: D.DeformConfig | None,
           cam: dict, width: int, height: int, bg,
           stage: str = "fine", active_sh_degree=3,
           delta_scale: float = 1.0, scaling_modifier: float = 1.0,
           means2d_offset: jnp.ndarray | None = None,
           key_cap: int | None = None,
           backend: str = "tiled") -> RenderResult:
    """cam: packed camera dict (mom_tpu/cameras.py pack()): viewmatrix,
    projmatrix, campos, tanfovx, tanfovy, time, frame_num."""
    common = _prepare(params, aux, deform_params, deform_cfg, cam,
                      width, height, bg, stage, active_sh_degree,
                      delta_scale, scaling_modifier, means2d_offset)
    if backend == "tiled":
        out = rasterize_tiled(**common, key_cap=key_cap)
        overflow = out.overflow
        instances = out.num_keys
    else:
        out = rasterize_reference(**common)
        overflow = jnp.zeros((), jnp.int32)
        instances = jnp.zeros((), jnp.int32)
    return RenderResult(color=out.color, depth=out.depth, final_T=out.final_T,
                        radii=out.radii, overflow=overflow,
                        instances=instances)
