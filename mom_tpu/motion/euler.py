"""Euler integration of a static motion field into a displacement field to
frame t — lax.scan rewrite of the python-loop EulerIntegration
(cinemagraphy euler_integration.py:5-59).

Semantics: starting at each pixel, repeatedly advect by the (bilinearly
sampled) motion at the current position; positions leaving the image stop
contributing (out-of-bounds masking, euler_integration.py:36-49).  Returns
the cumulative displacement per source pixel."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.gridsample import grid_sample_2d


@functools.partial(jax.jit, static_argnames=("steps",))
def euler_integrate(motion: jnp.ndarray, steps: int) -> jnp.ndarray:
    """motion (H, W, 2) per-frame displacement -> displacement (H, W, 2)
    accumulated over ``steps`` frames."""
    H, W = motion.shape[:2]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    pos0 = jnp.stack([xs, ys], -1).reshape(-1, 2)       # (N, 2) x,y
    mflat = motion.transpose(2, 0, 1)                    # (2, H, W)

    def body(carry, _):
        pos, disp, alivef = carry
        coords = jnp.stack([pos[:, 0] / (W - 1) * 2 - 1,
                            pos[:, 1] / (H - 1) * 2 - 1], -1)
        step = grid_sample_2d(mflat, coords)             # (N, 2)
        new_pos = pos + step
        inb = ((new_pos[:, 0] >= 0) & (new_pos[:, 0] <= W - 1)
               & (new_pos[:, 1] >= 0) & (new_pos[:, 1] <= H - 1))
        alivef = alivef * inb.astype(jnp.float32)
        disp = disp + step * alivef[:, None]
        pos = jnp.where(alivef[:, None] > 0, new_pos, pos)
        return (pos, disp, alivef), None

    disp0 = jnp.zeros_like(pos0)
    (pos, disp, _), _ = jax.lax.scan(
        body, (pos0, disp0, jnp.ones(pos0.shape[0])), None, length=steps)
    return disp.reshape(H, W, 2)
