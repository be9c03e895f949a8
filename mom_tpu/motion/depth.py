"""Metric depth estimation for stage 1.

The reference uses ZoeDepth (ZoeD_N: metric-bins head over a MiDaS BEiT-L
backbone, ZoeDepth/hubconf.py:33-111) downloaded via torch.hub.  This module
provides the same interface with pluggable backends:

- ``zoe``: the full JAX port (motion/zoe: BEiT-L + DPT decoder +
  metric-bins head, pad/flip augmented inference).  Weights convert from
  either the released ZoeD_M12_N.pt or a transformers DPT-BEiT checkpoint
  (zoe/convert.py); without a checkpoint the architecture runs with
  deterministic random weights (this machine has no egress).
- ``procedural`` (default fallback): a landscape depth prior — ground-plane
  depth increasing toward the horizon, sky pushed to the far plane, modulated
  by a luminance cue and edge-aware smoothing.  Stays the weightless default
  because random-weight ZoeDepth produces less plausible landscape geometry
  than the prior; pass a checkpoint (or backend='zoe') to switch.

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
            if backend == "procedural":
                import sys
                print("[mom_tpu] WARNING: no ZoeDepth checkpoint — using the "
                      "weight-free PROCEDURAL depth prior. Output quality is "
                      "NOT ZoeDepth quality; place ZoeD_M12_N.pt under the "
                      "--cinema_ckpt dir to use real weights.",
                      file=sys.stderr, flush=True)
        self.backend = backend
        self.ckpt_path = ckpt_path
        self._zoe = None
        if backend == "zoe":
            from .zoe import ZoeConfig, init_zoedepth
            if ckpt_path and os.path.exists(ckpt_path):
                from .zoe.convert import load_zoedepth
                self._zoe = load_zoedepth(ckpt_path)
            else:
                cfg = ZoeConfig()
                self._zoe = (init_zoedepth(jax.random.PRNGKey(0), cfg), cfg)

    def infer(self, image: np.ndarray) -> np.ndarray:
        """image (H, W, 3) float in [0,1] or uint8 -> depth (H, W) float32."""
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        if self.backend == "zoe":
            from .zoe import infer_depth
            params, cfg = self._zoe
            return infer_depth(params, cfg, image)
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
