"""Softmax splatting — XLA scatter-add rewrite of the cupy kernels in
softmax_splatting.py:9-361 (modes summation / average / linear / softmax) and
the joint future/past blend of joint_splatting.py:24-60.

Forward-warp features by a flow field; where multiple sources land on a
pixel, weight by exp(Z) (softmax mode) — deterministic scatter-add in XLA
instead of atomic adds."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("mode",))
def softsplat(feat: jnp.ndarray, flow: jnp.ndarray,
              metric: jnp.ndarray | None = None,
              mode: str = "softmax") -> jnp.ndarray:
    """feat (H, W, C), flow (H, W, 2) destination displacement (x, y),
    metric (H, W, 1) importance (softmax/linear modes).  Returns (H, W, C)
    (+ the normalization convention of FunctionSoftsplat)."""
    H, W, Cc = feat.shape
    if mode == "average":
        feat = jnp.concatenate([feat, jnp.ones((H, W, 1))], -1)
    elif mode == "linear":
        feat = jnp.concatenate([feat * metric, metric], -1)
    elif mode == "softmax":
        z = jnp.exp(jnp.clip(metric, -20.0, 20.0))
        feat = jnp.concatenate([feat * z, z], -1)
    C = feat.shape[-1]

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    u = (xs + flow[..., 0]).reshape(-1)
    v = (ys + flow[..., 1]).reshape(-1)
    vals = feat.reshape(-1, C)

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu, fv = u - u0, v - v0
    out = jnp.zeros((H * W, C))
    for du, dv, wgt in ((0, 0, (1 - fu) * (1 - fv)), (1, 0, fu * (1 - fv)),
                        (0, 1, (1 - fu) * fv), (1, 1, fu * fv)):
        uu = (u0 + du).astype(jnp.int32)
        vv = (v0 + dv).astype(jnp.int32)
        inb = (uu >= 0) & (uu <= W - 1) & (vv >= 0) & (vv <= H - 1)
        idx = jnp.where(inb, vv * W + uu, 0)
        w = jnp.where(inb, wgt, 0.0)
        out = out.at[idx].add(w[:, None] * vals)
    out = out.reshape(H, W, C)

    if mode == "summation":
        return out
    norm = out[..., -1:]
    return out[..., :-1] / jnp.maximum(norm, 1e-7)


@jax.jit
def joint_splatting(feat_fwd: jnp.ndarray, weight_fwd: jnp.ndarray,
                    flow_fwd: jnp.ndarray,
                    feat_bwd: jnp.ndarray, weight_bwd: jnp.ndarray,
                    flow_bwd: jnp.ndarray) -> jnp.ndarray:
    """Blend future- and past-warped features with importance weights
    (joint_splatting.py:24-60): both sources splat into one accumulator."""
    H, W, C = feat_fwd.shape
    feats = jnp.concatenate([feat_fwd[None], feat_bwd[None]], 0)
    flows = jnp.concatenate([flow_fwd[None], flow_bwd[None]], 0)
    metrics = jnp.concatenate([weight_fwd[None], weight_bwd[None]], 0)

    z = jnp.exp(jnp.clip(metrics, -20.0, 20.0))
    stacked = jnp.concatenate([feats * z, z], -1)
    Cz = stacked.shape[-1]

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    out = jnp.zeros((H * W, Cz))
    for s in range(2):
        u = (xs + flows[s, ..., 0]).reshape(-1)
        v = (ys + flows[s, ..., 1]).reshape(-1)
        vals = stacked[s].reshape(-1, Cz)
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        fu, fv = u - u0, v - v0
        for du, dv, wgt in ((0, 0, (1 - fu) * (1 - fv)),
                            (1, 0, fu * (1 - fv)),
                            (0, 1, (1 - fu) * fv), (1, 1, fu * fv)):
            uu = (u0 + du).astype(jnp.int32)
            vv = (v0 + dv).astype(jnp.int32)
            inb = (uu >= 0) & (uu <= W - 1) & (vv >= 0) & (vv <= H - 1)
            idx = jnp.where(inb, vv * W + uu, 0)
            w = jnp.where(inb, wgt, 0.0)
            out = out.at[idx].add(w[:, None] * vals)
    out = out.reshape(H, W, Cz)
    return out[..., :C] / jnp.maximum(out[..., C:], 1e-7)
