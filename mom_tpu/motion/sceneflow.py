"""3D scene-flow optimization — the TPU rewrite of optimize_motion
(train_motion.py:65-207).

The reference runs 200 epochs of full-batch SGD(lr=0.5, ExponentialLR 0.97)
where each epoch loops 25 views in python, projecting the (flow-shifted)
point cloud with numpy+torch and interpolating GT flows with scipy griddata.
Here:

- GT flow sampling at projected points = bilinear interpolation of the dense
  (H, W, 2) flow at the projected pixel coordinates (the reference's
  grid->scatter griddata call is exactly that, train_motion.py:120)
- all 25 views stack into one batched projection; the 200-epoch loop is a
  single lax.scan — one jit, zero host round-trips
- loss: mean over views of L1 over valid points of (pi(pts+flow) - pi(pts)
  - GT), optimizer steps once per epoch on the view-mean (the reference's
  running-mean + single step per epoch, train_motion.py:186-193)
- final dense 'our_flow' per view by forward-splatting the per-point flow
  residuals back to the pixel grid (reference scatter->grid griddata,
  train_motion.py:196-200)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.gridsample import grid_sample_2d


def sample_dense_flow(flow_hw2: jnp.ndarray, pix: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of (H, W, 2) at pix (2, N) pixel coords -> (2, N)."""
    H, W = flow_hw2.shape[:2]
    coords = jnp.stack([
        pix[0] / (W - 1) * 2.0 - 1.0,
        pix[1] / (H - 1) * 2.0 - 1.0,
    ], axis=-1)
    return grid_sample_2d(flow_hw2.transpose(2, 0, 1), coords).T


@functools.partial(jax.jit, static_argnames=("epochs",))
def optimize_scene_flow(points: jnp.ndarray,       # (3, N) world
                        Ks: jnp.ndarray,           # (V, 3, 3)
                        Rs: jnp.ndarray,           # (V, 3, 3) world->cam
                        Ts: jnp.ndarray,           # (V, 3, 1)
                        gt_flows: jnp.ndarray,     # (V, 2, N) GT @ points
                        valid: jnp.ndarray,        # (V, N)
                        epochs: int = 200,
                        lr: float = 0.5,
                        gamma: float = 0.97):
    """Returns (scene_flow (3, N), losses (epochs,))."""

    def project(pts):
        cam = jnp.einsum("vij,jn->vin", Rs, pts) + Ts
        hom = jnp.einsum("vij,vjn->vin", Ks, cam)
        return hom[:, :2] / hom[:, 2:3]

    base_pix = project(points)

    def loss_fn(flow):
        pix = project(points + flow)
        delta = pix - base_pix                       # (V, 2, N)
        err = jnp.abs(delta - gt_flows)
        per_view = (jnp.sum(err * valid[:, None, :], axis=(1, 2))
                    / jnp.maximum(2 * jnp.sum(valid, axis=1), 1.0))
        return jnp.mean(per_view)

    def epoch(carry, e):
        flow = carry
        loss, g = jax.value_and_grad(loss_fn)(flow)
        flow = flow - lr * (gamma ** e) * g
        return flow, loss

    flow0 = jnp.zeros_like(points)
    flow, losses = jax.lax.scan(epoch, flow0,
                                jnp.arange(epochs, dtype=jnp.float32))
    return flow, losses


def densify_point_flow(pix: np.ndarray, values: np.ndarray,
                       valid: np.ndarray, height: int, width: int):
    """Scatter per-point 2D values back to a dense (2, H, W) grid via
    normalized bilinear splatting (the final-epoch our_flow write,
    train_motion.py:196-200)."""
    u, v = jnp.asarray(pix[0]), jnp.asarray(pix[1])
    vals = jnp.asarray(values)                        # (2, N)
    w_valid = jnp.asarray(valid, jnp.float32)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu, fv = u - u0, v - v0
    num = jnp.zeros((height * width, 2))
    den = jnp.zeros(height * width)
    for du, dv, wgt in ((0, 0, (1 - fu) * (1 - fv)), (1, 0, fu * (1 - fv)),
                        (0, 1, (1 - fu) * fv), (1, 1, fu * fv)):
        uu = jnp.clip(u0 + du, 0, width - 1).astype(jnp.int32)
        vv = jnp.clip(v0 + dv, 0, height - 1).astype(jnp.int32)
        idx = vv * width + uu
        w = wgt * w_valid
        num = num.at[idx].add(w[:, None] * vals.T)
        den = den.at[idx].add(w)
    dense = num / jnp.maximum(den, 1e-8)[:, None]
    return np.asarray(dense.T.reshape(2, height, width))
