"""DPT reassemble + fusion decoder over the BEiT backbone, exposing the six
MidasCore feature taps ZoeDepth hooks into (midas.py:300-320):
out_conv (32ch @ full prep res), l4_rn (bottleneck), r4, r3, r2, r1.

Structure matches transformers DPTNeck/DPTFeatureFusionStage/
DPTDepthEstimationHead (modeling_dpt.py:489-960) == MiDaS DPT with
readout="project", reassemble factors (4, 2, 1, 0.5), neck hidden sizes
(256, 512, 1024, 1024), fusion width 256, no fusion batch-norm.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ...nn.layers import (linear, conv2d, conv_transpose2d, gelu,
                          interpolate)


class DPTConfig(NamedTuple):
    hidden_size: int = 1024
    neck_hidden_sizes: tuple = (256, 512, 1024, 1024)
    reassemble_factors: tuple = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256
    window: tuple = (24, 32)


def _conv_init(key, kh, kw, cin, cout, bias=True):
    fan_in = kh * kw * cin
    limit = float(np.sqrt(1.0 / fan_in))
    wk, bk = jax.random.split(key)
    p = {"w": jax.random.uniform(wk, (kh, kw, cin, cout), jnp.float32,
                                 -limit * np.sqrt(3), limit * np.sqrt(3))}
    if bias:
        p["b"] = jax.random.uniform(bk, (cout,), jnp.float32, -limit, limit)
    return p


def init_dpt(key, cfg: DPTConfig) -> dict:
    C = cfg.hidden_size
    F = cfg.fusion_hidden_size
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    params = {"reassemble": [], "convs": [], "fusion": []}
    for i, (ch, factor) in enumerate(zip(cfg.neck_hidden_sizes,
                                         cfg.reassemble_factors)):
        stage = {
            "readout": {"w": 0.02 * jax.random.truncated_normal(
                next(ki), -2, 2, (2 * C, C), jnp.float32),
                "b": jnp.zeros(C, jnp.float32)},
            "projection": _conv_init(next(ki), 1, 1, C, ch),
        }
        if factor > 1:
            f = int(factor)
            stage["resize"] = _conv_init(next(ki), f, f, ch, ch)
        elif factor < 1:
            stage["resize"] = _conv_init(next(ki), 3, 3, ch, ch)
        params["reassemble"].append(stage)
        params["convs"].append(_conv_init(next(ki), 3, 3, ch, F, bias=False))
    for _ in range(4):
        params["fusion"].append({
            "projection": _conv_init(next(ki), 1, 1, F, F),
            "res1": {"conv1": _conv_init(next(ki), 3, 3, F, F),
                     "conv2": _conv_init(next(ki), 3, 3, F, F)},
            "res2": {"conv1": _conv_init(next(ki), 3, 3, F, F),
                     "conv2": _conv_init(next(ki), 3, 3, F, F)},
        })
    params["head"] = {
        "conv1": _conv_init(next(ki), 3, 3, F, F // 2),
        "conv2": _conv_init(next(ki), 3, 3, F // 2, 32),
        "conv3": _conv_init(next(ki), 1, 1, 32, 1),
    }
    return params


def _reassemble(stage: dict, hidden: jnp.ndarray, window: tuple,
                factor: float) -> jnp.ndarray:
    """(B, N+1, C) sequence -> (B, h*factor, w*factor, ch) feature map
    (DPTReassembleStage.forward, readout 'project')."""
    B, _, C = hidden.shape
    cls, tokens = hidden[:, 0], hidden[:, 1:]
    readout = jnp.broadcast_to(cls[:, None, :], tokens.shape)
    proj = gelu(linear(stage["readout"],
                       jnp.concatenate([tokens, readout], axis=-1)))
    fmap = proj.reshape(B, window[0], window[1], C)
    fmap = conv2d(stage["projection"], fmap)
    if factor > 1:
        fmap = conv_transpose2d(stage["resize"], fmap, stride=int(factor))
    elif factor < 1:
        fmap = conv2d(stage["resize"], fmap, stride=int(round(1 / factor)),
                      padding=1)
    return fmap


def _pre_act_residual(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = conv2d(p["conv1"], jax.nn.relu(x), padding=1)
    h = conv2d(p["conv2"], jax.nn.relu(h), padding=1)
    return h + x


def _fusion_layer(p: dict, x: jnp.ndarray,
                  residual: jnp.ndarray | None) -> jnp.ndarray:
    if residual is not None:
        if residual.shape[1:3] != x.shape[1:3]:
            residual = interpolate(residual, x.shape[1:3],
                                   align_corners=False)
        x = x + _pre_act_residual(p["res1"], residual)
    x = _pre_act_residual(p["res2"], x)
    x = interpolate(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True)
    return conv2d(p["projection"], x)


def dpt_forward(params: dict, cfg: DPTConfig,
                hidden_states: list[jnp.ndarray]) -> dict:
    """4 backbone sequences -> {'rel_depth', 'out_conv', 'l4_rn',
    'r4', 'r3', 'r2', 'r1'} — the ZoeDepth layer_names taps
    (midas.py:273, :302-320)."""
    feats = []
    for i, hs in enumerate(hidden_states):
        fmap = _reassemble(params["reassemble"][i], hs, cfg.window,
                           cfg.reassemble_factors[i])
        feats.append(conv2d(params["convs"][i], fmap, padding=1))

    l4_rn = feats[3]
    r4 = _fusion_layer(params["fusion"][0], l4_rn, None)
    r3 = _fusion_layer(params["fusion"][1], r4, feats[2])
    r2 = _fusion_layer(params["fusion"][2], r3, feats[1])
    r1 = _fusion_layer(params["fusion"][3], r2, feats[0])

    h = params["head"]
    x = conv2d(h["conv1"], r1, padding=1)
    x = interpolate(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True)
    out_conv = jax.nn.relu(conv2d(h["conv2"], x, padding=1))
    rel_depth = jax.nn.relu(conv2d(h["conv3"], out_conv))[..., 0]

    return {"rel_depth": rel_depth, "out_conv": out_conv, "l4_rn": l4_rn,
            "r4": r4, "r3": r3, "r2": r2, "r1": r1}
