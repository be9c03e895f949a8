"""Spherical-harmonics evaluation (jittable, degree selected by masking).

Coefficients and band polynomials match the reference
(utils/sh_utils.py:26-112 / cuda_rasterizer/forward.cu:20-71).  Unlike the
reference, ``eval_sh`` takes the active degree as a *traced* integer and masks
inactive bands, so bumping the SH degree during training never retraces."""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def rgb2sh(rgb):
    return (rgb - 0.5) / C0


def sh2rgb(sh):
    return sh * C0 + 0.5


def sh_basis(dirs: jnp.ndarray) -> jnp.ndarray:
    """Degree-3 SH basis values at unit directions. dirs (..., 3) -> (..., 16)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    one = jnp.ones_like(x)
    return jnp.stack([
        C0 * one,
        -C1 * y, C1 * z, -C1 * x,
        C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
        C2[3] * xz, C2[4] * (xx - yy),
        C3[0] * y * (3.0 * xx - yy), C3[1] * xy * z,
        C3[2] * y * (4.0 * zz - xx - yy),
        C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
        C3[4] * x * (4.0 * zz - xx - yy), C3[5] * z * (xx - yy),
        C3[6] * x * (xx - 3.0 * yy),
    ], axis=-1)


def band_mask(active_degree, num_coeffs: int = 16) -> jnp.ndarray:
    """(num_coeffs,) float mask of coefficients active at ``active_degree``
    (a traced or static int). Coefficient i belongs to band floor(sqrt(i))."""
    idx = jnp.arange(num_coeffs)
    band = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
    return (band <= active_degree).astype(jnp.float32)


def eval_sh(active_degree, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH colors.

    sh   : (..., K, C) coefficients, K <= 16 (reference layout: band-major)
    dirs : (..., 3) unit directions
    Returns (..., C).  Bands above ``active_degree`` contribute zero.

    Unrolled fused multiply-adds instead of an einsum: XLA lowers batched
    (1, K) x (K, C) per-point dots terribly at millions of points."""
    K = sh.shape[-2]
    basis = sh_basis(dirs)                      # (..., 16)
    mask = band_mask(active_degree, K)
    out = 0.0
    for k in range(K):
        out = out + (mask[k] * basis[..., k])[..., None] * sh[..., k, :]
    return out
