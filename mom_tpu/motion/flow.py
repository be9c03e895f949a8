"""2D Eulerian flow estimation for stage 1.

The reference runs a SPADE-UNet motion model (3d-cinemagraphy) whose INPUT is
a dense 'hint' field: sparse user motion arrows splatted with per-hint
gaussian weights, restricted to the fluid mask (cinemagraphy demo.py:24-105).
The network refines that prior; its weights are not obtainable offline, so
the default backend here is the hint densification itself plus the
reference's own post-smoothing (7x box_blur(15) then mask+rescale,
renderer.py:592-623) — a faithful, weight-free approximation of the same
operator.  A ``spade`` backend hook is reserved for the ported network.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def densify_hints(hints_start: np.ndarray, hints_end: np.ndarray,
                  mask: np.ndarray, height: int, width: int,
                  sigma_scale: float = 1.0, n_frames: float = 60.0,
                  rng: np.random.RandomState | None = None) -> jnp.ndarray:
    """Gaussian-weighted scatter of hint motions (demo.py:24-105).

    hints_start/hints_end: (M, 2) pixel coords (x, y); mask (H, W) in {0,1}.
    Motion per hint = (end - start) / n_frames (per-frame displacement).
    sigma is drawn per hint in [H/(2m), 2H/m] for m hints (demo.py:86-97
    randomizes; pass rng for reproducibility).  Returns (H, W, 2)."""
    m = max(len(hints_start), 1)
    rng = rng or np.random.RandomState(0)
    sigmas = rng.uniform(height / (2 * m), 2 * height / m,
                         size=len(hints_start)) * sigma_scale

    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    num = jnp.zeros((height, width, 2))
    den = jnp.zeros((height, width, 1))
    for k in range(len(hints_start)):
        hx, hy = hints_start[k]
        motion = (np.asarray(hints_end[k]) - np.asarray(hints_start[k])) \
            / n_frames
        d2 = (xs - hx) ** 2 + (ys - hy) ** 2
        w = jnp.exp(-d2 / (2 * sigmas[k] ** 2))[..., None]
        num = num + w * jnp.asarray(motion, jnp.float32)
        den = den + w
    dense = num / jnp.maximum(den, 1e-8)
    return dense * jnp.asarray(mask, jnp.float32)[..., None]


def _box_blur(x: jnp.ndarray, size: int = 15) -> jnp.ndarray:
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                              (size, size, 1), (1, 1, 1), "SAME")
    ones = jnp.ones(x.shape[:2] + (1,))
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add,
                              (size, size, 1), (1, 1, 1), "SAME")
    return s / n


@jax.jit
def smooth_and_mask_flow(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """compute_flow_and_inpaint's post-processing (renderer.py:592-623):
    7 passes of 15x15 box blur, then restrict to the mask and rescale to
    preserve the pre-blur magnitude inside the mask."""
    mag_before = jnp.abs(flow).max()
    out = flow
    for _ in range(7):
        out = _box_blur(out, 15)
    out = out * mask[..., None]
    mag_after = jnp.abs(out).max()
    out = out * (mag_before / jnp.maximum(mag_after, 1e-8))
    return out


class FlowEstimator:
    def __init__(self, backend: str = "hints", ckpt_path: str | None = None):
        self.backend = backend
        if backend == "spade":
            raise NotImplementedError(
                "SPADE-UNet port is scheduled for a later round; "
                "use backend='hints'.")

    def estimate(self, image: np.ndarray, mask: np.ndarray,
                 hints_start, hints_end, seed: int = 0) -> np.ndarray:
        """Returns (1, 2, H, W) float32 — the reference's T2C_flow layout
        (train_motion.py:84)."""
        H, W = mask.shape[:2]
        dense = densify_hints(np.asarray(hints_start, np.float32),
                              np.asarray(hints_end, np.float32),
                              mask, H, W, rng=np.random.RandomState(seed))
        flow = smooth_and_mask_flow(dense, jnp.asarray(mask, jnp.float32))
        return np.asarray(flow).transpose(2, 0, 1)[None]
