"""Shared neural-net building blocks for the pretrained-stack ports.

All tensors are NHWC (TPU-native layout; convolutions feed the MXU directly
via lax.conv_general_dilated NHWC/HWIO).  Parameter trees are plain dicts:
conv {"w": (kh, kw, in, out), "b": (out,)?}, linear {"w": (in, out),
"b": (out,)?}, layernorm {"g": (C,), "b": (C,)}.

Interpolation matches torch.nn.functional.interpolate exactly (both
align_corners settings, bilinear and bicubic, antialias=False) and is
implemented as two dense 1-D resampling matmuls — the (out, in) weight
matrices are built in numpy at trace time (static shapes), so resizes ride
the MXU instead of gathers.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# basic layers

def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"]
    if "b" in p and p["b"] is not None:
        y = y + p["b"]
    return y


def conv2d(p: dict, x: jnp.ndarray, stride: int = 1, padding=0,
           dilation: int = 1) -> jnp.ndarray:
    """x: (N, H, W, C); p["w"]: (kh, kw, in, out)."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p and p["b"] is not None:
        y = y + p["b"]
    return y


def conv_transpose2d(p: dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Transposed conv with padding=0: input dilated by ``stride``, padded by
    (k-1), then CORRELATED with p["w"] (kh, kw, in, out).

    torch ConvTranspose2d equivalence: torch applies its (in, out, kh, kw)
    kernel spatially FLIPPED relative to this correlation, so the converter
    must store w = flip(torch_w.transpose(2, 3, 0, 1), axes=(0, 1))."""
    kh, kw = p["w"].shape[:2]
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p and p["b"] is not None:
        y = y + p["b"]
    return y


def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def gelu(x):
    # torch nn.GELU default = exact erf formulation
    return jax.nn.gelu(x, approximate=False)


def softplus(x):
    return jax.nn.softplus(x)


# ---------------------------------------------------------------------------
# torch-exact interpolation as dense matmuls

def _resample_matrix_linear(in_size: int, out_size: int,
                            align_corners: bool) -> np.ndarray:
    """(out, in) bilinear sampling weights matching F.interpolate
    (antialias=False)."""
    W = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        W[:, 0] = 1.0
        return W
    for j in range(out_size):
        if align_corners:
            src = j * (in_size - 1) / max(out_size - 1, 1)
        else:
            src = (j + 0.5) * in_size / out_size - 0.5
        src = min(max(src, 0.0), in_size - 1)
        i0 = int(np.floor(src))
        i1 = min(i0 + 1, in_size - 1)
        f = src - i0
        W[j, i0] += 1.0 - f
        W[j, i1] += f
    return W


def _cubic_kernel(t: np.ndarray, A: float = -0.75) -> np.ndarray:
    """torch bicubic convolution kernel (A = -0.75)."""
    at = np.abs(t)
    out = np.zeros_like(at)
    m1 = at <= 1
    out[m1] = ((A + 2) * at[m1] - (A + 3)) * at[m1] * at[m1] + 1
    m2 = (at > 1) & (at < 2)
    out[m2] = (((at[m2] - 5) * at[m2] + 8) * at[m2] - 4) * A
    return out


def _resample_matrix_cubic(in_size: int, out_size: int,
                           align_corners: bool) -> np.ndarray:
    W = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        W[:, 0] = 1.0
        return W
    for j in range(out_size):
        if align_corners:
            src = j * (in_size - 1) / max(out_size - 1, 1)
        else:
            src = (j + 0.5) * in_size / out_size - 0.5
        i0 = int(np.floor(src))
        f = src - i0
        idx = np.array([i0 - 1, i0, i0 + 1, i0 + 2])
        w = _cubic_kernel(np.array([f + 1, f, 1 - f, 2 - f]))
        # torch clamps indices to the valid range (border replicate)
        idx = np.clip(idx, 0, in_size - 1)
        for ii, ww in zip(idx, w):
            W[j, ii] += ww
    return W


@functools.lru_cache(maxsize=256)
def _resample_matrices(in_h, in_w, out_h, out_w, align_corners, mode):
    build = (_resample_matrix_linear if mode == "bilinear"
             else _resample_matrix_cubic)
    return (jnp.asarray(build(in_h, out_h, align_corners)),
            jnp.asarray(build(in_w, out_w, align_corners)))


def interpolate(x: jnp.ndarray, size: tuple[int, int],
                align_corners: bool = False,
                mode: str = "bilinear") -> jnp.ndarray:
    """torch F.interpolate(mode=bilinear|bicubic, antialias=False) for NHWC
    inputs.  Static output size; separable resampling via two matmuls."""
    in_h, in_w = x.shape[-3], x.shape[-2]
    out_h, out_w = int(size[0]), int(size[1])
    if (in_h, in_w) == (out_h, out_w):
        return x
    Wh, Ww = _resample_matrices(in_h, in_w, out_h, out_w,
                                bool(align_corners), mode)
    y = jnp.einsum("oh,...hwc->...owc", Wh, x)
    return jnp.einsum("pw,...owc->...opc", Ww, y)
