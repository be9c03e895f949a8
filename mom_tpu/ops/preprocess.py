"""Per-Gaussian screen-space preprocessing (differentiable, pure XLA).

Replicates the math of the reference CUDA preprocess kernel
(cuda_rasterizer/forward.cu:74-256) as a vmappable JAX function:

- frustum culling at view z <= 0.2 (auxiliary.h:139-164)
- perspective projection with 1e-7-regularized w (forward.cu:197-200)
- 3D covariance from (activated) scale + (normalized) quaternion:
  Sigma = R diag(s^2) R^T (forward.cu:118-152, glm column-major unrolled)
- EWA 2D covariance with 1.3*tan_fov frustum clamp and +0.3px low-pass
  (forward.cu:74-113)
- conic (inverse 2D covariance), radius = ceil(3*sqrt(max eigenvalue))
  (forward.cu:218-232)
- ndc -> pixel mapping ((v+1)*S - 1)*0.5 (auxiliary.h:41-44)
- SH -> clamped RGB along the camera ray (forward.cu:20-71)

The whole backward pass of this stage is obtained by JAX autodiff (the
reference hand-writes it in backward.cu:144-414); gradients agree because the
forward math is identical.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import sh as sh_utils

NEAR_CULL_Z = 0.2
LOWPASS = 0.3


class Preprocessed(NamedTuple):
    means2d: jnp.ndarray     # (P, 2) pixel coords
    conic: jnp.ndarray       # (P, 3) inverse 2D covariance (a, b, c)
    depths: jnp.ndarray      # (P,) view-space z
    radii: jnp.ndarray       # (P,) float radius in pixels (0 for culled)
    colors: jnp.ndarray      # (P, 3) RGB from SH (or passthrough)
    opacities: jnp.ndarray   # (P,) activated opacity
    valid: jnp.ndarray       # (P,) bool — survives culling and det>0


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz -> (..., 3, 3); expects pre-normalized quaternions
    (the rasterizer is fed rotation_activation output, forward.cu:127)."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1),
        jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1),
        jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)
    return R


def compute_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                  scale_modifier: float = 1.0) -> jnp.ndarray:
    """(P,3) activated scales + (P,4) quats -> (P,6) upper-triangular
    [s00,s01,s02,s11,s12,s22] of Sigma = R diag(s^2) R^T.

    Structure-of-arrays scalar math — per-point 3x3 einsums lower to slow
    batched tiny dots at millions of points."""
    r, x, y, z = (rotations[..., 0], rotations[..., 1], rotations[..., 2],
                  rotations[..., 3])
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0 = (scale_modifier * scales[..., 0]) ** 2
    s1 = (scale_modifier * scales[..., 1]) ** 2
    s2 = (scale_modifier * scales[..., 2]) ** 2
    # Sigma_ab = sum_k r_ak r_bk s_k
    s00 = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    s01 = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    s02 = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    s11 = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    s12 = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    s22 = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return jnp.stack([s00, s01, s02, s11, s12, s22], -1)


def compute_cov2d(means3d, cov3d, viewmatrix, tanfovx, tanfovy,
                  focal_x, focal_y):
    """EWA projection of the 3D covariance (forward.cu:74-113).
    Returns (P, 3) = (cov00+0.3, cov01, cov11+0.3)."""
    t = means3d @ viewmatrix[:3, :3].T + viewmatrix[:3, 3]
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    # culled points can sit at tz == 0 (e.g. dead fixed-capacity slots at the
    # camera origin); guard the divisions so neither forward values nor
    # backward 0*inf products go non-finite.  Valid points have tz > 0.2.
    tz = jnp.where(t[..., 2] > NEAR_CULL_Z, t[..., 2], 1.0)
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    # J rows of the affine approximation (only first two rows matter)
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)

    W = viewmatrix[:3, :3]           # world->view rotation
    # M = J @ W, rows m0, m1, per-component (P,) arrays (SoA)
    m0 = [j00 * W[0, c] + j02 * W[2, c] for c in range(3)]
    m1 = [j11 * W[1, c] + j12 * W[2, c] for c in range(3)]

    s00, s01, s02, s11, s12, s22 = [cov3d[..., i] for i in range(6)]

    def sigma_dot(v):   # Sigma @ v, components
        return [s00 * v[0] + s01 * v[1] + s02 * v[2],
                s01 * v[0] + s11 * v[1] + s12 * v[2],
                s02 * v[0] + s12 * v[1] + s22 * v[2]]

    sm0 = sigma_dot(m0)
    c00 = m0[0] * sm0[0] + m0[1] * sm0[1] + m0[2] * sm0[2] + LOWPASS
    c01 = m1[0] * sm0[0] + m1[1] * sm0[1] + m1[2] * sm0[2]
    sm1 = sigma_dot(m1)
    c11 = m1[0] * sm1[0] + m1[1] * sm1[1] + m1[2] * sm1[2] + LOWPASS
    return jnp.stack([c00, c01, c11], -1)


def ndc2pix(v, size):
    return ((v + 1.0) * size - 1.0) * 0.5


def preprocess(means3d: jnp.ndarray,
               scales: jnp.ndarray,
               rotations: jnp.ndarray,
               opacities: jnp.ndarray,
               shs: jnp.ndarray | None,
               viewmatrix: jnp.ndarray,
               projmatrix: jnp.ndarray,
               campos: jnp.ndarray,
               tanfovx, tanfovy,
               width: int, height: int,
               active_sh_degree=3,
               scale_modifier: float = 1.0,
               colors_precomp: jnp.ndarray | None = None,
               cov3d_precomp: jnp.ndarray | None = None,
               means2d_offset: jnp.ndarray | None = None,
               alive_mask: jnp.ndarray | None = None) -> Preprocessed:
    """All inputs already activated (exp scales, normalized quats, sigmoid
    opacity), matching what the reference feeds its rasterizer
    (gaussian_renderer/__init__.py:130-132,158-166).

    ``means2d_offset`` (P,2), if given, is added to the projected pixel
    coordinates; passing zeros and taking its gradient yields the per-Gaussian
    screen-space gradient used for densification stats (the reference's
    ``screenspace_points`` trick, gaussian_renderer/__init__.py:30)."""
    P = means3d.shape[0]
    focal_y = height / (2.0 * tanfovy)
    focal_x = width / (2.0 * tanfovx)

    p_view = means3d @ viewmatrix[:3, :3].T + viewmatrix[:3, 3]
    depths = p_view[..., 2]
    in_front = depths > NEAR_CULL_Z

    p_hom = means3d @ projmatrix[:3, :3].T + projmatrix[:3, 3]
    w = means3d @ projmatrix[3, :3] + projmatrix[3, 3]
    denom = w + 1e-7
    denom = jnp.where(jnp.abs(denom) > 1e-6, denom, 1.0)   # culled-point guard
    p_w = 1.0 / denom
    p_proj = p_hom * p_w[..., None]

    if cov3d_precomp is None:
        cov3d = compute_cov3d(scales, rotations, scale_modifier)
    else:
        cov3d = cov3d_precomp
    cov2d = compute_cov2d(means3d, cov3d, viewmatrix, tanfovx, tanfovy,
                          focal_x, focal_y)

    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c, -b, a], -1) / det_safe[..., None]

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, mid - jnp.sqrt(
        jnp.maximum(0.1, mid * mid - det)))))

    mean2d = jnp.stack([ndc2pix(p_proj[..., 0], width),
                        ndc2pix(p_proj[..., 1], height)], -1)
    if means2d_offset is not None:
        mean2d = mean2d + means2d_offset

    if colors_precomp is None:
        dirs = means3d - campos
        # norm's gradient is NaN at exactly 0 (dead slots sitting on the
        # camera); the epsilon inside the sqrt keeps both directions finite
        dirs = dirs * jax.lax.rsqrt(
            jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-20)
        colors = jnp.maximum(
            sh_utils.eval_sh(active_sh_degree, shs, dirs) + 0.5, 0.0)
    else:
        colors = colors_precomp

    valid = in_front & det_ok
    if alive_mask is not None:
        # dead fixed-capacity slots: excluded from binning and rendering
        valid = valid & alive_mask
    radii = jnp.where(valid, radius, 0.0)
    opac = opacities.reshape(P)

    # sanitize culled gaussians: their view-z can be ~0 (NaN/inf conic and
    # SH direction); they never contribute, but 0 * NaN would still poison
    # the compositing sums
    v1 = valid[..., None]
    mean2d = jnp.where(v1, mean2d, 0.0)
    conic = jnp.where(v1, conic, jnp.array([1.0, 0.0, 1.0]))
    colors = jnp.where(v1, colors, 0.0)
    depths = jnp.where(valid, depths, 0.0)
    return Preprocessed(means2d=mean2d, conic=conic, depths=depths,
                        radii=radii, colors=colors, opacities=opac,
                        valid=valid)
