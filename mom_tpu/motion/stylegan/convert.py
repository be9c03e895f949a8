"""torch -> JAX weight conversion for the StyleCineGAN stack.

- from_g_ema: rosinality Generator state dict (the 'g_ema' payload of
  sg2-lhq-1024.pt, utils/model_utils.py:21-24)
- from_fs_encoder: fs_encoder_v2 state dict (enc.pth.tar / checkpoint.pth
  'enc_state_dict'), eval-mode BatchNorms folded to scale/shift
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .generator import GeneratorConfig


def _a(x):
    return np.asarray(x.detach().cpu() if hasattr(x, "detach") else x,
                      np.float32)


def _equal_linear(sd, key, in_dim, lr_mul=1.0):
    return {"w": jnp.asarray(_a(sd[f"{key}.weight"])),
            "b": jnp.asarray(_a(sd[f"{key}.bias"])),
            "scale": (1.0 / math.sqrt(in_dim)) * lr_mul, "lr_mul": lr_mul}


def _modconv(sd, key, demod=True):
    w = _a(sd[f"{key}.weight"])[0]                     # (out, in, k, k)
    in_ch = w.shape[1]
    k = w.shape[-1]
    return {"w": jnp.asarray(w),
            "scale": 1.0 / math.sqrt(in_ch * k * k),
            "mod": _equal_linear(sd, f"{key}.modulation",
                                 _a(sd[f"{key}.modulation.weight"]).shape[1]),
            "demod": demod}


def from_g_ema(sd: dict, cfg: GeneratorConfig) -> dict:
    params = {
        "style": [_equal_linear(sd, f"style.{i + 1}", cfg.style_dim,
                                lr_mul=0.01) for i in range(cfg.n_mlp)],
        "input": jnp.asarray(_a(sd["input.input"]).transpose(0, 2, 3, 1)),
        "conv1": {"conv": _modconv(sd, "conv1.conv"),
                  "noise_w": jnp.asarray(_a(sd["conv1.noise.weight"])
                                         .reshape(())),
                  "act_bias": jnp.asarray(_a(sd["conv1.activate.bias"]))},
        "to_rgb1": {"conv": _modconv(sd, "to_rgb1.conv", demod=False),
                    "bias": jnp.asarray(_a(sd["to_rgb1.bias"]).reshape(-1))},
        "convs": [], "to_rgbs": [], "noises": [],
    }
    for li in range(cfg.num_layers):
        params["noises"].append(jnp.asarray(
            _a(sd[f"noises.noise_{li}"]).transpose(0, 2, 3, 1)))
    n_pairs = cfg.log_size - 2
    for i in range(2 * n_pairs):
        params["convs"].append({
            "conv": _modconv(sd, f"convs.{i}.conv"),
            "upsample": i % 2 == 0,
            "noise_w": jnp.asarray(_a(sd[f"convs.{i}.noise.weight"])
                                   .reshape(())),
            "act_bias": jnp.asarray(_a(sd[f"convs.{i}.activate.bias"]))})
    for i in range(n_pairs):
        params["to_rgbs"].append({
            "conv": _modconv(sd, f"to_rgbs.{i}.conv", demod=False),
            "bias": jnp.asarray(_a(sd[f"to_rgbs.{i}.bias"]).reshape(-1))})
    return params


# ---------------------------------------------------------------------------
# fs encoder

def _fold_bn(sd, key, eps=1e-5):
    g = _a(sd[f"{key}.weight"])
    b = _a(sd[f"{key}.bias"])
    mean = _a(sd[f"{key}.running_mean"])
    var = _a(sd[f"{key}.running_var"])
    scale = g / np.sqrt(var + eps)
    return {"scale": jnp.asarray(scale), "shift": jnp.asarray(b - mean * scale)}


def _conv_hwio(sd, key):
    return {"w": jnp.asarray(_a(sd[f"{key}.weight"]).transpose(2, 3, 1, 0))}


def from_fs_encoder(sd: dict, dlatent_avg=None) -> dict:
    from .encoder import IRESNET50_LAYERS
    params = {
        "stem_conv": _conv_hwio(sd, "conv.0"),
        "stem_bn": _fold_bn(sd, "conv.1"),
        "stem_prelu": jnp.asarray(_a(sd["conv.2.weight"])),
        "layers": [], "styles": [],
    }
    for li, n in enumerate(IRESNET50_LAYERS):
        blocks = []
        for j in range(n):
            pre = f"block_{li + 1}.{j}"
            p = {"bn1": _fold_bn(sd, f"{pre}.bn1"),
                 "conv1": _conv_hwio(sd, f"{pre}.conv1"),
                 "bn2": _fold_bn(sd, f"{pre}.bn2"),
                 "prelu": jnp.asarray(_a(sd[f"{pre}.prelu.weight"])),
                 "conv2": _conv_hwio(sd, f"{pre}.conv2"),
                 "bn3": _fold_bn(sd, f"{pre}.bn3"),
                 "stride": 2 if j == 0 else 1}
            if f"{pre}.downsample.0.weight" in sd:
                p["down_conv"] = _conv_hwio(sd, f"{pre}.downsample.0")
                p["down_bn"] = _fold_bn(sd, f"{pre}.downsample.1")
            blocks.append(p)
        params["layers"].append(blocks)
    i = 0
    while f"styles.{i}.weight" in sd:
        params["styles"].append({
            "w": jnp.asarray(_a(sd[f"styles.{i}.weight"]).T),
            "b": jnp.asarray(_a(sd[f"styles.{i}.bias"]))})
        i += 1
    params["content"] = {
        "bn0": _fold_bn(sd, "content_layer.0"),
        "conv1": _conv_hwio(sd, "content_layer.1"),
        "bn1": _fold_bn(sd, "content_layer.2"),
        "prelu": jnp.asarray(_a(sd["content_layer.3.weight"])),
        "conv2": _conv_hwio(sd, "content_layer.4"),
        "bn2": _fold_bn(sd, "content_layer.5"),
    }
    params["dlatent_avg"] = (jnp.asarray(_a(dlatent_avg).reshape(-1))
                             if dlatent_avg is not None
                             else jnp.zeros(512, jnp.float32))
    return params


def load_g_ema(path: str, cfg: GeneratorConfig) -> dict:
    """Load a StyleGAN2 checkpoint file in the released nesting
    ({'g_ema': sd, ...} — utils/model_utils.py:21-24) or a raw state dict."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "g_ema" in sd:
        sd = sd["g_ema"]
    return from_g_ema(sd, cfg)


def load_fs_encoder_ckpt(path: str, dlatent_avg=None) -> dict:
    """Load a feature-style encoder checkpoint in the released nesting
    ({'enc_state_dict': sd, ...} — feature_style_encoder/trainer.py:336,349)
    or a raw state dict."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "enc_state_dict" in sd:
        sd = sd["enc_state_dict"]
    return from_fs_encoder(sd, dlatent_avg)
