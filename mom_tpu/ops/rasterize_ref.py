"""Pure-JAX oracle rasterizer.

Implements the *framework compositing semantics* (shared bit-for-bit with the
production tile-binned Pallas kernel in rasterize.py) as a simple chunked scan
over depth-sorted Gaussians, differentiable end-to-end by autodiff.  Used as
the correctness oracle in tests and as the baseline config of BASELINE.json.

Compositing semantics (a deterministic, order-parallel reformulation of
cuda_rasterizer/forward.cu:261-379):

  power_j  = -0.5 (a dx^2 + c dy^2) - b dx dy            (forward.cu:338)
  alpha_j  = min(0.99, opacity_j * exp(power_j))          (forward.cu:346)
  contrib gate: alpha_j >= 1/255, pixel tile inside the Gaussian's tile rect
                (forward.cu:347, getRect auxiliary.h:46-56)
  T_j      = prod_{k<j, gate_k} (1 - alpha_k)
  weight_j = gate_j and T_j >= 1e-4  ?  alpha_j * T_j  :  0
  C        = sum_j weight_j * color_j + T_N * bg          (forward.cu:357-377)
  D        = sum_j weight_j * depth_j

This differs from the CUDA kernel only at the T≈1e-4 termination boundary
(the CUDA loop tests T*(1-alpha) and freezes T at the stop; we gate on T and
keep multiplying), bounding the per-pixel output difference by 1e-4 — far
below 1/255 quantization.  In exchange the recurrence becomes a prefix sum in
log space, which is the natural TPU formulation, and the backward pass is an
exact gradient (the CUDA backward relies on nondeterministic atomicAdd,
backward.cu:416-590)."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import Preprocessed, preprocess

TILE = 16
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


class RenderOutput(NamedTuple):
    color: jnp.ndarray     # (H, W, 3)
    depth: jnp.ndarray     # (H, W)
    final_T: jnp.ndarray   # (H, W)
    radii: jnp.ndarray     # (P,)


def tile_rect(means2d, radii, width, height):
    """Per-Gaussian tile rectangle [min, max) (auxiliary.h:46-56)."""
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    mn = jnp.stack([
        jnp.clip(((means2d[..., 0] - radii) / TILE).astype(jnp.int32), 0, grid_x),
        jnp.clip(((means2d[..., 1] - radii) / TILE).astype(jnp.int32), 0, grid_y),
    ], -1)
    mx = jnp.stack([
        jnp.clip(((means2d[..., 0] + radii + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x),
        jnp.clip(((means2d[..., 1] + radii + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y),
    ], -1)
    return mn, mx


def composite_reference(pre: Preprocessed, bg, width, height, chunk=64):
    """Scan over depth-sorted Gaussians, compositing all pixels at once."""
    P = pre.means2d.shape[0]
    Pp = ((P + chunk - 1) // chunk) * chunk

    order = jnp.argsort(pre.depths)
    def pad(x, fill=0.0):
        x = x[order]
        return jnp.concatenate([x, jnp.full((Pp - P,) + x.shape[1:], fill, x.dtype)])

    means2d = pad(pre.means2d)
    conic = pad(pre.conic)
    colors = pad(pre.colors)
    depths = pad(pre.depths)
    opac = pad(pre.opacities)
    alive = pad((pre.valid & (pre.radii > 0)).astype(jnp.float32))
    rmn, rmx = tile_rect(means2d, pad(pre.radii), width, height)

    dtype = pre.means2d.dtype
    px = jnp.arange(width, dtype=dtype)[None, :]     # (1, W)
    py = jnp.arange(height, dtype=dtype)[:, None]    # (H, 1)
    tx = (jnp.arange(width) // TILE)[None, :]
    ty = (jnp.arange(height) // TILE)[:, None]

    def body(carry, xs):
        logT, acc = carry
        m2d, con, col, dep, op, al, mn, mx = xs

        dx = m2d[:, 0, None, None] - px[None]                  # (G, H, W)
        dy = m2d[:, 1, None, None] - py[None]
        a = con[:, 0, None, None]
        b = con[:, 1, None, None]
        c = con[:, 2, None, None]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op[:, None, None] * jnp.exp(power))

        in_rect = ((tx[None] >= mn[:, 0, None, None]) & (tx[None] < mx[:, 0, None, None]) &
                   (ty[None] >= mn[:, 1, None, None]) & (ty[None] < mx[:, 1, None, None]))
        gate = in_rect & (alpha >= ALPHA_MIN) & (power <= 0.0) & (al[:, None, None] > 0)
        alpha = jnp.where(gate, alpha, 0.0)

        u = jnp.log1p(-alpha)                                   # 0 where gated off
        logT_j = logT[None] + jnp.cumsum(u, axis=0) - u          # exclusive prefix
        T_j = jnp.exp(logT_j)
        w = jnp.where(gate & (T_j >= T_EPS), alpha * T_j, 0.0)   # (G, H, W)

        feat = jnp.concatenate([col, dep[:, None]], -1)          # (G, 4)
        acc = acc + jnp.einsum("ghw,gf->hwf", w, feat)
        logT = logT + jnp.sum(u, axis=0)
        return (logT, acc), None

    logT0 = jnp.zeros((height, width), dtype)
    acc0 = jnp.zeros((height, width, 4), dtype)
    xs = (means2d.reshape(-1, chunk, 2), conic.reshape(-1, chunk, 3),
          colors.reshape(-1, chunk, 3), depths.reshape(-1, chunk),
          opac.reshape(-1, chunk), alive.reshape(-1, chunk),
          rmn.reshape(-1, chunk, 2), rmx.reshape(-1, chunk, 2))
    xs = jax.tree.map(lambda t: jnp.swapaxes(t, 0, 0), xs)
    # remat per chunk: otherwise autodiff saves the full [chunk, H, W] alpha
    # stack for every scan step (gigabytes at 512^2)
    (logT, acc), _ = jax.lax.scan(jax.checkpoint(body), (logT0, acc0), xs)

    final_T = jnp.exp(logT)
    color = acc[..., :3] + final_T[..., None] * jnp.asarray(bg, dtype)
    return color, acc[..., 3], final_T


def rasterize_reference(means3d, scales, rotations, opacities, shs,
                        viewmatrix, projmatrix, campos, tanfovx, tanfovy,
                        width: int, height: int, bg,
                        active_sh_degree=3, scale_modifier: float = 1.0,
                        colors_precomp=None, means2d_offset=None,
                        alive_mask=None, chunk: int = 64) -> RenderOutput:
    pre = preprocess(means3d, scales, rotations, opacities, shs,
                     viewmatrix, projmatrix, campos, tanfovx, tanfovy,
                     width, height, active_sh_degree, scale_modifier,
                     colors_precomp=colors_precomp,
                     means2d_offset=means2d_offset, alive_mask=alive_mask)
    color, depth, final_T = composite_reference(pre, bg, width, height, chunk)
    return RenderOutput(color=color, depth=depth, final_T=final_T,
                        radii=pre.radii)
