"""Misc numerics shared across the framework."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def inverse_sigmoid_np(x):
    return np.log(x / (1 - x))


def expon_lr(step, lr_init: float, lr_final: float,
             lr_delay_steps: float = 0.0, lr_delay_mult: float = 1.0,
             max_steps: int = 1_000_000):
    """Log-linear LR decay; jnp-traceable version of the reference's
    get_expon_lr_func (utils/general_utils.py:35-68)."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
    return jnp.where(step < 0, 0.0, delay_rate * log_lerp)


def pil_to_array(pil_image, resolution=None) -> np.ndarray:
    """PIL image -> float32 HWC array in [0,1] (reference PILtoTorch,
    general_utils.py:21-33, without the permute)."""
    if resolution is not None:
        pil_image = pil_image.resize(resolution)
    arr = np.array(pil_image)
    if arr.max() != 1:
        arr = arr.astype(np.float32) / 255.0
    else:
        arr = arr.astype(np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr
