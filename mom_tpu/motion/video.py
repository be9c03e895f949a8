"""Looping cinemagraph video generation.

The reference generates video frames by GAN inversion + feature-space
warping inside StyleGAN2 (StyleCineGAN main_jih.py:27-179,
warp_blend_feature model.py:573-700).  Its core motion operator —
euler-integrate the flow forward to t and backward to t-N, softmax-splat
both and alpha-blend for a seamless loop (cinemagraph_utils.py:131-176) — is
generator-agnostic; the default backend here applies it at pixel level,
which needs no network weights and produces a seamless looping video.  A
``stylegan`` backend hook is reserved for the ported generator.

Loop blending (blend_feature, cinemagraph_utils.py:131-176):
  alpha   = (N - t) / N
  Z_fwd   = importance log(alpha / (1 - alpha + eps)) at each pixel... the
            reference uses Z = (1 - alpha)/alpha-weighted softmax between
            the t-step forward warp and the (t - N)-step backward warp.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .euler import euler_integrate
from .splat import joint_splatting


def generate_loop_frames(image: np.ndarray, flow: np.ndarray,
                         mask: np.ndarray, n_frames: int = 120,
                         backend: str = "pixel") -> list[np.ndarray]:
    """image (H, W, 3) [0,1]; flow (H, W, 2) per-frame displacement;
    mask (H, W) in {0,1} fluid region.  Returns n_frames (H, W, 3) arrays.
    Frame composition: result*mask + input*(1-mask) (main_jih.py:161)."""
    if backend != "pixel":
        raise NotImplementedError(
            "StyleGAN2 feature-warping backend is scheduled for a later "
            "round; use backend='pixel'.")
    img = jnp.asarray(image, jnp.float32)
    m = jnp.asarray(mask, jnp.float32)[..., None]
    flow_j = jnp.asarray(flow, jnp.float32) * m

    frames = [np.asarray(img)]
    for t in range(1, n_frames):
        alpha = 1.0 - t / float(n_frames)
        disp_fwd = euler_integrate(flow_j, t)
        disp_bwd = euler_integrate(-flow_j, n_frames - t)
        # importance: Z = (1-alpha)/alpha flavored weights in log space
        z_fwd = jnp.full(img.shape[:2] + (1,),
                         float(np.log(max(alpha, 1e-6))))
        z_bwd = jnp.full(img.shape[:2] + (1,),
                         float(np.log(max(1.0 - alpha, 1e-6))))
        warped = joint_splatting(img, z_fwd, disp_fwd,
                                 img, z_bwd, disp_bwd)
        # fill any un-hit pixels with the source image before masking
        hit = joint_splatting(jnp.ones_like(img[..., :1]), z_fwd, disp_fwd,
                              jnp.ones_like(img[..., :1]), z_bwd, disp_bwd)
        warped = jnp.where(hit > 0.5, warped, img)
        out = warped * m + img * (1.0 - m)
        frames.append(np.asarray(jnp.clip(out, 0, 1)))
    return frames
