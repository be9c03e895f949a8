"""StyleGAN2 generator (rosinality layout) in JAX, NHWC, batch-1 synthesis.

Mirrors models/stylegan2/model.py:
- style MLP: PixelNorm + n_mlp EqualLinear(lr_mul) with fused leaky relu
  (:365-390)
- ModulatedConv2d with equalized lr, demodulation and blur-filtered
  up/downsampling (:178-280)
- StyledConv (+NoiseInjection with stored noise buffers) and ToRGB skips
  (:316-363)
- warp_blend_feature (:573-700): feature injection at recon_feature_idx and
  per-level warped to_rgb rendering from warp_feature_idx up, including the
  skip reset at the warp level.

Weights live in a plain pytree; converters in convert.py.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .ops import fused_leaky_relu, make_kernel, upfirdn2d, upsample2

BLUR_KERNEL = (1, 3, 3, 1)


class GeneratorConfig(NamedTuple):
    size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2

    @property
    def channels(self) -> dict:
        cm = self.channel_multiplier
        return {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * cm,
                128: 128 * cm, 256: 64 * cm, 512: 32 * cm, 1024: 16 * cm}

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1


# ---------------------------------------------------------------------------
# init

def _equal_linear_init(key, in_dim, out_dim, lr_mul=1.0, bias_init=0.0):
    w = jax.random.normal(key, (out_dim, in_dim), jnp.float32) / lr_mul
    return {"w": w, "b": jnp.full(out_dim, bias_init, jnp.float32),
            "scale": (1.0 / math.sqrt(in_dim)) * lr_mul, "lr_mul": lr_mul}


def _modconv_init(key, in_ch, out_ch, k, style_dim, demodulate=True):
    wk, mk = jax.random.split(key)
    return {
        "w": jax.random.normal(wk, (out_ch, in_ch, k, k), jnp.float32),
        "scale": 1.0 / math.sqrt(in_ch * k * k),
        "mod": _equal_linear_init(mk, style_dim, in_ch, bias_init=1.0),
        "demod": demodulate,
    }


def init_generator(key, cfg: GeneratorConfig) -> dict:
    ch = cfg.channels
    keys = jax.random.split(key, 128)
    ki = iter(keys)
    params = {
        "style": [_equal_linear_init(next(ki), cfg.style_dim, cfg.style_dim,
                                     lr_mul=0.01)
                  for _ in range(cfg.n_mlp)],
        "input": jax.random.normal(next(ki), (1, 4, 4, ch[4]), jnp.float32),
        "conv1": {"conv": _modconv_init(next(ki), ch[4], ch[4], 3,
                                        cfg.style_dim),
                  "noise_w": jnp.zeros((), jnp.float32),
                  "act_bias": jnp.zeros(ch[4], jnp.float32)},
        "to_rgb1": {"conv": _modconv_init(next(ki), ch[4], 3, 1,
                                          cfg.style_dim, demodulate=False),
                    "bias": jnp.zeros(3, jnp.float32)},
        "convs": [], "to_rgbs": [], "noises": [],
    }
    for li in range(cfg.num_layers):
        res = (li + 5) // 2
        params["noises"].append(jax.random.normal(
            next(ki), (1, 2 ** res, 2 ** res, 1), jnp.float32))
    in_ch = ch[4]
    for i in range(3, cfg.log_size + 1):
        out_ch = ch[2 ** i]
        for up in (True, False):
            params["convs"].append({
                "conv": _modconv_init(next(ki), in_ch if up else out_ch,
                                      out_ch, 3, cfg.style_dim),
                "upsample": up,
                "noise_w": jnp.zeros((), jnp.float32),
                "act_bias": jnp.zeros(out_ch, jnp.float32)})
        params["to_rgbs"].append({
            "conv": _modconv_init(next(ki), out_ch, 3, 1, cfg.style_dim,
                                  demodulate=False),
            "bias": jnp.zeros(3, jnp.float32)})
        in_ch = out_ch
    return params


# ---------------------------------------------------------------------------
# forward pieces

def _equal_linear(p, x, activation=False):
    out = x @ (p["w"] * p["scale"]).T
    if activation:
        return fused_leaky_relu(out, p["b"] * p["lr_mul"])
    return out + p["b"] * p["lr_mul"]


def style_forward(params, z):
    """Style MLP: z (B, 512) -> w (B, 512) (model.py:381-390)."""
    x = z * jax.lax.rsqrt(jnp.mean(z * z, axis=-1, keepdims=True) + 1e-8)
    for lp in params["style"]:
        x = _equal_linear(lp, x, activation=True)
    return x


def mean_latent(params, n: int, key) -> jnp.ndarray:
    z = jax.random.normal(key, (n, params["style"][0]["w"].shape[1]))
    return jnp.mean(style_forward(params, z), axis=0, keepdims=True)


def _modulated_conv(p, x, style, upsample=False):
    """x (1, H, W, Cin), style (512,).  model.py:236-280 for batch 1."""
    w = p["scale"] * p["w"]                           # (out, in, k, k)
    mod = _equal_linear(p["mod"], style[None])[0]     # (in,)
    w = w * mod[None, :, None, None]
    if p["demod"]:
        demod = jax.lax.rsqrt(jnp.sum(w * w, axis=(1, 2, 3)) + 1e-8)
        w = w * demod[:, None, None, None]
    k = w.shape[-1]
    if upsample:
        # F.conv_transpose2d(stride=2, padding=0) == dilate + pad(k-1) +
        # correlate with the spatially-flipped kernel, then factor-gain blur
        rhs = jnp.transpose(w, (2, 3, 1, 0))[::-1, ::-1]   # HWIO flipped
        out = jax.lax.conv_general_dilated(
            x, rhs, window_strides=(1, 1),
            padding=((k - 1, k - 1), (k - 1, k - 1)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bk = make_kernel(BLUR_KERNEL) * 4
        p_ = (bk.shape[0] - 2) - (k - 1)
        out = upfirdn2d(out, bk, pad=((p_ + 1) // 2 + 1, p_ // 2 + 1))
        return out
    rhs = jnp.transpose(w, (2, 3, 1, 0))              # (k, k, in, out)
    return jax.lax.conv_general_dilated(
        x, rhs, window_strides=(1, 1),
        padding=((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _styled_conv(p, x, style, noise, upsample=False):
    out = _modulated_conv(p["conv"], x, style, upsample=upsample)
    out = out + p["noise_w"] * noise
    return fused_leaky_relu(out, p["act_bias"])


def _to_rgb(p, x, style, skip=None):
    out = _modulated_conv(p["conv"], x, style)
    out = out + p["bias"]
    if skip is not None:
        out = out + upsample2(skip, BLUR_KERNEL)
    return out


def _expand_latent(cfg: GeneratorConfig, latent: jnp.ndarray) -> jnp.ndarray:
    """(512,) or (n_latent, 512) -> (n_latent, 512)."""
    if latent.ndim == 1:
        latent = jnp.tile(latent[None], (cfg.n_latent, 1))
    elif latent.ndim == 3:
        latent = latent[0]
    return latent


def synthesize(params, cfg: GeneratorConfig, latent: jnp.ndarray,
               features_in=None, feature_scale: float = 1.0):
    """Plain synthesis from W+ latents with stored noise buffers
    (Generator.forward, model.py:462-...); optional feature override at
    layer index k: features_in = (k, feature) replaces the activation
    before conv index k like the fs trainer's features_in list.
    Returns (image (1, H, W, 3), features list)."""
    latent = _expand_latent(cfg, latent)
    noises = params["noises"]
    out = jnp.tile(params["input"], (1, 1, 1, 1))
    feats = [out]
    out = _styled_conv(params["conv1"], out, latent[0], noises[0])
    feats.append(out)
    skip = _to_rgb(params["to_rgb1"], out, latent[1])

    k_override = features_in[0] if features_in is not None else -1
    i = 1
    layer_i = 1
    for pair in range(len(params["to_rgbs"])):
        c1 = params["convs"][2 * pair]
        c2 = params["convs"][2 * pair + 1]
        if i == k_override:
            out = (1 - feature_scale) * out + feature_scale * features_in[1]
        out = _styled_conv(c1, out, latent[i], noises[layer_i], upsample=True)
        feats.append(out)
        if i + 1 == k_override:
            out = (1 - feature_scale) * out + feature_scale * features_in[1]
        out = _styled_conv(c2, out, latent[i + 1], noises[layer_i + 1])
        feats.append(out)
        skip = _to_rgb(params["to_rgbs"][pair], out, latent[i + 2], skip)
        i += 2
        layer_i += 2
    return skip, feats


def warp_blend_feature(params, cfg: GeneratorConfig, latent: jnp.ndarray,
                       feature: jnp.ndarray, warp_fn,
                       recon_feature_idx: int = 9,
                       warp_feature_idx: int = 9) -> jnp.ndarray:
    """model.py:573-700 with the default stored noises.  ``warp_fn(x)``
    warps a (1, H, W, C) feature map (frame index / flow are closed over).
    feature: (1, h, w, C) the encoder feature injected at recon_feature_idx.
    Returns the rendered image (1, size, size, 3)."""
    assert recon_feature_idx <= warp_feature_idx
    latent = _expand_latent(cfg, latent)
    noises = params["noises"]

    out = jnp.tile(params["input"], (1, 1, 1, 1))
    out = _styled_conv(params["conv1"], out, latent[0], noises[0])
    skip = _to_rgb(params["to_rgb1"], out, latent[1])

    i = 1
    for pair in range(len(params["to_rgbs"])):
        c1 = params["convs"][2 * pair]
        c2 = params["convs"][2 * pair + 1]
        n1 = noises[2 * pair + 1]
        n2 = noises[2 * pair + 2]
        to_rgb = params["to_rgbs"][pair]
        if (i < recon_feature_idx) and (i + 1 < recon_feature_idx):
            out = _styled_conv(c1, out, latent[i], n1, upsample=True)
            out = _styled_conv(c2, out, latent[i + 1], n2)
            # skip NOT accumulated below the recon level (is_random=False)
        else:
            if i == recon_feature_idx:
                out = _styled_conv(c1, feature, latent[i], n1, upsample=True)
            else:
                out = _styled_conv(c1, out, latent[i], n1, upsample=True)

            out_w = None
            if i == warp_feature_idx:
                out_w = _styled_conv(c2, warp_fn(out), latent[i + 1], n2)

            if i + 1 == recon_feature_idx:
                out = _styled_conv(c2, feature, latent[i + 1], n2)
            else:
                out = _styled_conv(c2, out, latent[i + 1], n2)

            if i + 1 == warp_feature_idx:
                out_w = warp_fn(out)

            if (i == warp_feature_idx) or (i + 1 == warp_feature_idx):
                skip = _to_rgb(to_rgb, out_w, latent[i + 2], skip=None)
            elif i > warp_feature_idx:
                out_w = warp_fn(out)
                skip = _to_rgb(to_rgb, out_w, latent[i + 2], skip=skip)
        i += 2
    return skip
