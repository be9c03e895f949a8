"""StyleGAN2 primitive ops in plain XLA (NHWC).

The reference builds fused_bias_act / upfirdn2d as CUDA extensions
(models/stylegan2/op/*.cu); on TPU these are ordinary pad/conv/elementwise
graphs that XLA fuses — no kernel needed (SURVEY.md §2.2).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def make_kernel(k) -> np.ndarray:
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / k.sum()


def fused_leaky_relu(x: jnp.ndarray, bias: jnp.ndarray | None = None,
                     negative_slope: float = 0.2,
                     scale: float = SQRT2) -> jnp.ndarray:
    """fused_bias_act: leaky_relu(x + bias) * sqrt(2); bias broadcasts on
    the channel (last) axis."""
    if bias is not None:
        x = x + bias
    return jax.nn.leaky_relu(x, negative_slope) * scale


def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1,
              down: int = 1, pad=(0, 0)) -> jnp.ndarray:
    """x: (B, H, W, C).  Upsample by zero-insertion, pad (possibly negative),
    FIR filter (true convolution — kernel flipped), downsample.  Matches
    upfirdn2d_native (op/upfirdn2d.py:150-186)."""
    B, H, W, C = x.shape
    k = jnp.asarray(kernel, jnp.float32)[::-1, ::-1]
    kh, kw = k.shape
    rhs = jnp.tile(k[:, :, None, None], (1, 1, 1, C))        # depthwise
    pad0, pad1 = int(pad[0]), int(pad[1])
    # the reference zero-inserts to n*up (up-1 trailing zeros,
    # upfirdn2d.py:157); XLA lhs_dilation yields (n-1)*up+1, so the
    # trailing zeros fold into the end padding
    return jax.lax.conv_general_dilated(
        x, rhs, window_strides=(down, down),
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up), feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def blur(x: jnp.ndarray, kernel: np.ndarray, pad) -> jnp.ndarray:
    return upfirdn2d(x, kernel, pad=pad)


def upsample2(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Upsample module (model.py:30-48): up=2 with a gain-4 kernel."""
    k = make_kernel(kernel) * 4
    p = k.shape[0] - 2
    return upfirdn2d(x, k, up=2, pad=((p + 1) // 2 + 1, p // 2))
