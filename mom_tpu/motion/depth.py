"""Metric depth estimation for stage 1.

The reference uses ZoeDepth (ZoeD_N: metric-bins head over a MiDaS BEiT-L
backbone, ZoeDepth/hubconf.py:33-111) downloaded via torch.hub.  This module
provides the same interface with pluggable backends:

- ``zoe``: a JAX port fed by converted checkpoint weights.  The full BEiT/DPT
  port lands in a later round; if a checkpoint is supplied before then we
  fail with a clear message rather than guessing.
- ``procedural`` (default fallback): a landscape depth prior — ground-plane
  depth increasing toward the horizon, sky pushed to the far plane, modulated
  by a luminance cue and edge-aware smoothing.  Zero-weight default so the
  full pipeline runs in a hermetic environment (this machine has no egress to
  fetch ZoeDepth weights, and the reference itself cannot run offline).

Outputs metric depth in meters, scaled so the center crop sits near the
reference's typical hemisphere pivot (train_motion.py:40-41).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


class DepthEstimator:
    def __init__(self, backend: str = "auto", ckpt_path: str | None = None):
        if backend == "auto":
            backend = "zoe" if (ckpt_path and os.path.exists(ckpt_path)) \
                else "procedural"
        self.backend = backend
        self.ckpt_path = ckpt_path
        if backend == "zoe":
            raise NotImplementedError(
                "ZoeDepth JAX port is scheduled for a later round; "
                "use backend='procedural' (no checkpoint needed).")

    def infer(self, image: np.ndarray) -> np.ndarray:
        """image (H, W, 3) float in [0,1] or uint8 -> depth (H, W) float32."""
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        return np.asarray(procedural_depth(jnp.asarray(image)))


@jax.jit
def procedural_depth(image: jnp.ndarray, near: float = 2.0,
                     far: float = 30.0, sky_far: float = 60.0) -> jnp.ndarray:
    """Landscape depth prior.  (H, W, 3) in [0,1] -> (H, W) meters."""
    H, W = image.shape[:2]
    lum = image.mean(-1)
    r, g, b = image[..., 0], image[..., 1], image[..., 2]

    # ground-plane term: depth grows hyperbolically toward the horizon
    row = jnp.linspace(1.0, 0.0, H)[:, None]          # 1 at bottom, 0 at top
    horizon = 0.55                                     # fraction from top
    below = jnp.clip((1.0 - row) - horizon, -horizon, 1.0)
    ground = near + (far - near) * jnp.clip(
        1.0 - jnp.clip(below / (1.0 - horizon), 0.0, 1.0), 0.0, 1.0)

    # sky cue: bright and blue-dominant pixels near the top
    blueness = jnp.clip(b - 0.5 * (r + g), 0.0, 1.0)
    top = jnp.clip(1.0 - row * 2.0, 0.0, 1.0)
    sky_score = jnp.clip(3.0 * blueness + 1.2 * lum - 0.8, 0.0, 1.0) * top
    depth = ground * (1.0 - sky_score) + sky_far * sky_score

    # edge-aware smoothing: a few bilateral-flavored box passes
    def smooth(d, _):
        dpad = jnp.pad(d, 1, mode="edge")
        neigh = jnp.stack([dpad[:-2, 1:-1], dpad[2:, 1:-1],
                           dpad[1:-1, :-2], dpad[1:-1, 2:], d])
        lpad = jnp.pad(lum, 1, mode="edge")
        lneigh = jnp.stack([lpad[:-2, 1:-1], lpad[2:, 1:-1],
                            lpad[1:-1, :-2], lpad[1:-1, 2:], lum])
        wgt = jnp.exp(-jnp.abs(lneigh - lum) * 8.0)
        return (neigh * wgt).sum(0) / wgt.sum(0), None

    depth, _ = jax.lax.scan(smooth, depth, None, length=8)
    return depth.astype(jnp.float32)
