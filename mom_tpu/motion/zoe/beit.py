"""BEiT vision transformer backbone (BEiT-L/16 for ZoeD_N), NHWC/TPU-native.

Architecture matches transformers.models.beit modeling (the verified port of
timm/MiDaS BEiT): no absolute position embeddings, per-layer relative
position bias with 3 extra cls entries, q/v-biased k-unbiased attention,
layer-scale lambdas, pre-norm blocks (modeling_beit.py BeitLayer).

The relative-position bias is MATERIALIZED at parameter-build time for the
configured window (static shapes; ZoeD_N always runs the prep-resized
384x512 input -> 24x32 window), so the jitted forward only adds a constant
(heads, N+1, N+1) tensor to the attention scores — no gathers on the hot
path.  Tables trained at a different window are resized by the converter
(convert.resize_rel_pos_table), mirroring BeitRelativePositionBias.forward.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ...nn.layers import linear, layer_norm, gelu


class BeitConfig(NamedTuple):
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    patch_size: int = 16
    layer_norm_eps: float = 1e-12
    window: tuple = (24, 32)          # patches (H/16, W/16) of the prep size
    out_indices: tuple = (6, 12, 18, 24)   # 1-based block outputs (BEiT-L)
    layer_scale_init: float = 0.1


def beit_large_config(img_hw=(384, 512)) -> BeitConfig:
    return BeitConfig(window=(img_hw[0] // 16, img_hw[1] // 16))


# ---------------------------------------------------------------------------
# relative position bias

def relative_position_index(window: tuple) -> np.ndarray:
    """(N+1, N+1) int index into the bias table — BeitRelativePositionBias.
    generate_relative_position_index (modeling_beit.py:578-601)."""
    wh, ww = window
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))            # (2, wh, ww)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]                # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    area = wh * ww
    idx = np.zeros((area + 1, area + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


def materialize_rel_pos_bias(table: np.ndarray, window: tuple) -> np.ndarray:
    """table (num_rel_distance, heads) sized for ``window`` -> bias
    (heads, N+1, N+1)."""
    idx = relative_position_index(window)
    bias = table[idx.reshape(-1)].reshape(idx.shape[0], idx.shape[1], -1)
    return np.ascontiguousarray(bias.transpose(2, 0, 1))


def num_relative_distance(window: tuple) -> int:
    return (2 * window[0] - 1) * (2 * window[1] - 1) + 3


def resize_rel_pos_table(table: np.ndarray, old_window: tuple,
                         new_window: tuple) -> np.ndarray:
    """Resize a bias table trained at old_window to new_window, mirroring
    BeitRelativePositionBias.forward (modeling_beit.py:603-630, the MiDaS
    v3.1 arbitrary-window modification) including its (width, height)
    reshape quirk; bilinear, half-pixel (align_corners=False)."""
    from ...nn.layers import _resample_matrix_linear
    oh, ow = 2 * old_window[0] - 1, 2 * old_window[1] - 1
    nh, nw = 2 * new_window[0] - 1, 2 * new_window[1] - 1
    heads = table.shape[1]
    sub = table[:oh * ow]                           # (oh*ow, heads)
    sub = sub.reshape(ow, oh, heads)                # transformers quirk:
    #   reshape(1, old_width, old_height, -1) then bilinear to (nh, nw)
    Wh = _resample_matrix_linear(ow, nh, False)     # axis 0: ow -> nh
    Ww = _resample_matrix_linear(oh, nw, False)     # axis 1: oh -> nw
    sub = np.einsum("ab,bch->ach", Wh, sub)         # (nh, oh, heads)
    sub = np.einsum("cd,adh->ach", Ww, sub)         # (nh, nw, heads)
    new_table = np.concatenate(
        [sub.reshape(nh * nw, heads), table[oh * ow:]], axis=0)
    return new_table.astype(np.float32)


def specialize_window(params: dict, old_window: tuple,
                      new_window: tuple) -> dict:
    """Re-materialize every layer's rel_pos_bias for a new input window
    (prep-resize output geometry varies with the source aspect ratio)."""
    if tuple(old_window) == tuple(new_window):
        return params
    out = dict(params)
    out["layers"] = []
    for lp in params["layers"]:
        table = np.asarray(lp["rel_pos_table"])
        table = resize_rel_pos_table(table, old_window, new_window)
        lp = dict(lp)
        lp["rel_pos_table"] = jnp.asarray(table)
        lp["rel_pos_bias"] = jnp.asarray(
            materialize_rel_pos_bias(table, new_window))
        out["layers"].append(lp)
    return out


# ---------------------------------------------------------------------------
# init

def _lin_init(key, fan_in, fan_out, bias=True, std=0.02):
    wk, _ = jax.random.split(key)
    p = {"w": std * jax.random.truncated_normal(
        wk, -2, 2, (fan_in, fan_out), jnp.float32)}
    if bias:
        p["b"] = jnp.zeros(fan_out, jnp.float32)
    return p


def init_beit(key, cfg: BeitConfig) -> dict:
    C, H = cfg.hidden_size, cfg.num_heads
    keys = jax.random.split(key, cfg.num_layers + 2)
    params = {
        "cls_token": jnp.zeros(C, jnp.float32),
        "patch_embed": {
            "w": 0.02 * jax.random.truncated_normal(
                keys[0], -2, 2,
                (cfg.patch_size, cfg.patch_size, 3, C), jnp.float32),
            "b": jnp.zeros(C, jnp.float32)},
        "layers": [],
    }
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[i + 1], 6)
        table = 0.02 * np.asarray(jax.random.truncated_normal(
            lk[5], -2, 2, (num_relative_distance(cfg.window), H),
            jnp.float32))
        params["layers"].append({
            "ln1": {"g": jnp.ones(C), "b": jnp.zeros(C)},
            "ln2": {"g": jnp.ones(C), "b": jnp.zeros(C)},
            "q": _lin_init(lk[0], C, C),
            "k": _lin_init(lk[1], C, C, bias=False),
            "v": _lin_init(lk[2], C, C),
            "attn_out": _lin_init(lk[3], C, C),
            "fc1": _lin_init(lk[4], C, cfg.mlp_dim),
            "fc2": _lin_init(lk[4], cfg.mlp_dim, C),
            "lambda1": jnp.full(C, cfg.layer_scale_init, jnp.float32),
            "lambda2": jnp.full(C, cfg.layer_scale_init, jnp.float32),
            # raw table kept for window re-specialization / re-export;
            # the materialized bias is what the forward consumes
            "rel_pos_table": jnp.asarray(table),
            "rel_pos_bias": jnp.asarray(
                materialize_rel_pos_bias(table, cfg.window)),
        })
    return params


# ---------------------------------------------------------------------------
# forward

def _attention(lp: dict, x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    B, N, C = x.shape
    D = C // num_heads
    q = linear(lp["q"], x).reshape(B, N, num_heads, D)
    k = linear(lp["k"], x).reshape(B, N, num_heads, D)
    v = linear(lp["v"], x).reshape(B, N, num_heads, D)
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(D)
    scores = scores + lp["rel_pos_bias"][None]
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhnm,bmhd->bnhd", probs, v).reshape(B, N, C)
    return linear(lp["attn_out"], ctx)


def _block(lp: dict, x: jnp.ndarray, cfg: BeitConfig) -> jnp.ndarray:
    attn = _attention(lp, layer_norm(lp["ln1"], x, cfg.layer_norm_eps),
                      cfg.num_heads)
    x = x + lp["lambda1"] * attn
    h = layer_norm(lp["ln2"], x, cfg.layer_norm_eps)
    h = linear(lp["fc2"], gelu(linear(lp["fc1"], h)))
    return x + lp["lambda2"] * h


def beit_forward(params: dict, cfg: BeitConfig,
                 pixels: jnp.ndarray) -> list[jnp.ndarray]:
    """pixels: (B, H, W, 3) normalized.  Returns the hidden-state sequences
    (B, N+1, C) at cfg.out_indices (1-based block outputs, matching
    BeitBackbone's stage indexing where hidden_states[0] = embeddings)."""
    B = pixels.shape[0]
    pe = params["patch_embed"]
    x = jax.lax.conv_general_dilated(
        pixels, pe["w"], window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")) + pe["b"]
    x = x.reshape(B, -1, cfg.hidden_size)               # row-major (H, W)
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)

    taps = []
    want = set(cfg.out_indices)
    for i, lp in enumerate(params["layers"]):
        x = _block(lp, x, cfg)
        if (i + 1) in want:
            taps.append(x)
    return taps
