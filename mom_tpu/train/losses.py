"""Training losses and image metrics (reference utils/loss_utils.py,
utils/image_utils.py)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred, gt):
    return jnp.abs(pred - gt).mean()


def l2_loss(pred, gt):
    return ((pred - gt) ** 2).mean()


def psnr(pred, gt, mask=None):
    """PSNR per image (utils/image_utils.py:14-38); inputs (..., H, W, C) or
    any matching shapes; reduces over all but the leading axis if batched."""
    mse = ((pred - gt) ** 2).mean()
    return 20 * jnp.log10(1.0 / jnp.sqrt(mse))


def _gaussian_window(window_size: int = 11, sigma: float = 1.5):
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    return jnp.asarray(g / g.sum(), jnp.float32)


def ssim(img1, img2, window_size: int = 11):
    """SSIM with an 11x11 separable gaussian window, matching the reference
    (utils/loss_utils.py:52-92: per-channel depthwise conv, same padding).
    Inputs (H, W, C) or (B, H, W, C) in [0, 1]."""
    return ssim_map(img1, img2, window_size).mean()


def ssim_map(img1, img2, window_size: int = 11):
    """Per-pixel SSIM map (B, H, W, C); ``ssim`` is its mean.  Exposed so
    the point-sharded loss can crop the rows of its image band out of a
    halo-extended computation (parallel/point_sharded.py)."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    win = _gaussian_window(window_size)

    H, W = img1.shape[1], img1.shape[2]

    def blur(x):
        # separable depthwise conv with zero padding (torch conv2d padding=5)
        pad = window_size // 2
        x = jnp.moveaxis(x, -1, 1)                       # (B, C, H, W)
        xpad = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)))
        x = sum(win[i] * xpad[:, :, i:i + H, :] for i in range(window_size))
        xpad = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pad, pad)))
        x = sum(win[i] * xpad[:, :, :, i:i + W] for i in range(window_size))
        return jnp.moveaxis(x, 1, -1)

    mu1 = blur(img1)
    mu2 = blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    return (((2 * mu1_mu2 + C1) * (2 * sigma12 + C2))
            / ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)))
