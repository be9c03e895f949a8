"""ZoeDepth (ZoeD_N) assembled model + inference wrapper.

Mirrors zoedepth_v1.py:38-236 (ZoeDepth.forward over MidasCore taps) with
the ZoeD_N infer config (config_zoedepth.json): n_bins=64 softplus seed
bins, inv/mean attractors alpha=1000 gamma=2, bin_embedding_dim=128,
n_attractors (16, 8, 4, 1), min_temp=0.0212 max_temp=50, img_size
(384, 512), force_keep_ar=True.

Inference reproduces depth_model.py:58-151: reflect-pad by sqrt(dim/2)*3,
MidasCore prep (keep-aspect 'minimal' resize to multiples of 32 toward
384x512, normalize mean/std 0.5, midas.py:143-188), model forward,
bicubic resize back, crop, horizontal-flip average.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ...nn.layers import conv2d, interpolate
from . import beit as B
from . import dpt as DPT
from . import bins as BN


class ZoeConfig(NamedTuple):
    n_bins: int = 64
    bin_embedding_dim: int = 128
    bin_centers_type: str = "softplus"
    n_attractors: tuple = (16, 8, 4, 1)
    attractor_alpha: float = 1000.0
    attractor_gamma: int = 2
    attractor_kind: str = "mean"
    attractor_type: str = "inv"
    min_depth: float = 1e-3
    max_depth: float = 10.0
    min_temp: float = 0.0212
    max_temp: float = 50.0
    img_size: tuple = (384, 512)              # (net_h, net_w)
    # backbone/decoder (BEiT-L + DPT, scaled down in tests)
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    neck_hidden_sizes: tuple = (256, 512, 1024, 1024)
    fusion_hidden_size: int = 256
    out_indices: tuple = (6, 12, 18, 24)
    layer_norm_eps: float = 1e-12

    @property
    def window(self):
        return (self.img_size[0] // 16, self.img_size[1] // 16)

    def beit(self) -> B.BeitConfig:
        return B.BeitConfig(
            hidden_size=self.hidden_size, num_layers=self.num_layers,
            num_heads=self.num_heads, mlp_dim=self.mlp_dim,
            layer_norm_eps=self.layer_norm_eps, window=self.window,
            out_indices=self.out_indices)

    def dpt(self) -> DPT.DPTConfig:
        return DPT.DPTConfig(
            hidden_size=self.hidden_size,
            neck_hidden_sizes=self.neck_hidden_sizes,
            fusion_hidden_size=self.fusion_hidden_size, window=self.window)


def init_zoedepth(key, cfg: ZoeConfig) -> dict:
    kb, kd, k1, k2, k3, k4, k5 = jax.random.split(key, 7)
    # MidasCore output_channels are all fusion_hidden_size (256) for BEiT-L
    # (midas.py:363-371): btlnck = channels[0], x_blocks = channels[1:]
    c = cfg.fusion_hidden_size
    ka = jax.random.split(k4, 4)
    params = {
        "backbone": B.init_beit(kb, cfg.beit()),
        "decoder": DPT.init_dpt(kd, cfg.dpt()),
        "conv2": DPT._conv_init(k1, 1, 1, c, c),     # zoedepth_v1.py:88
        "seed_bin_regressor": BN.init_seed_bin_regressor(
            k2, c, n_bins=cfg.n_bins),
        "seed_projector": BN.init_projector(k3, c, cfg.bin_embedding_dim),
        "projectors": [BN.init_projector(ka[i], c, cfg.bin_embedding_dim)
                       for i in range(4)],
        "attractors": [BN.init_attractor(
            jax.random.fold_in(k5, i), cfg.bin_embedding_dim,
            cfg.n_attractors[i],
            normed=cfg.bin_centers_type in ("normed", "hybrid2"))
            for i in range(4)],
        "conditional_log_binomial": BN.init_cond_log_binomial(
            jax.random.fold_in(k5, 99), 32 + 1, cfg.bin_embedding_dim),
    }
    return params


def zoedepth_forward(params: dict, cfg: ZoeConfig,
                     pixels: jnp.ndarray) -> dict:
    """pixels: (B, net_h, net_w, 3) ALREADY prep-normalized ((x-0.5)/0.5).
    Returns {'metric_depth': (B, net_h, net_w), 'rel_depth': ...}
    (zoedepth_v1.py:144-236)."""
    taps = B.beit_forward(params["backbone"], cfg.beit(), pixels)
    core = DPT.dpt_forward(params["decoder"], cfg.dpt(), taps)

    btlnck = core["l4_rn"]
    x = conv2d(params["conv2"], btlnck)
    if cfg.bin_centers_type in ("normed", "hybrid2"):
        _, seed_centers = BN.seed_bin_regressor_normed(
            params["seed_bin_regressor"], x, cfg.min_depth, cfg.max_depth)
        b_prev = (seed_centers - cfg.min_depth) / (cfg.max_depth
                                                   - cfg.min_depth)
    else:
        _, seed_centers = BN.seed_bin_regressor_unnormed(
            params["seed_bin_regressor"], x)
        b_prev = seed_centers
    prev_emb = BN.projector(params["seed_projector"], x)

    normed = cfg.bin_centers_type in ("normed", "hybrid2")
    b_centers = None
    for i, blk in enumerate([core["r4"], core["r3"], core["r2"],
                             core["r1"]]):
        emb = BN.projector(params["projectors"][i], blk)
        if normed:
            b, b_centers = BN.attractor_layer_normed(
                params["attractors"][i], emb, b_prev, prev_emb,
                min_depth=cfg.min_depth, max_depth=cfg.max_depth,
                alpha=cfg.attractor_alpha, gamma=cfg.attractor_gamma,
                kind=cfg.attractor_kind, attractor_type=cfg.attractor_type)
        else:
            b, b_centers = BN.attractor_layer_unnormed(
                params["attractors"][i], emb, b_prev, prev_emb,
                alpha=cfg.attractor_alpha, gamma=cfg.attractor_gamma,
                kind=cfg.attractor_kind, attractor_type=cfg.attractor_type)
        b_prev = b
        prev_emb = emb

    last = core["out_conv"]                       # (B, H, W, 32)
    rel_cond = interpolate(core["rel_depth"][..., None], last.shape[1:3],
                           align_corners=True)
    last = jnp.concatenate([last, rel_cond], axis=-1)
    emb_up = interpolate(prev_emb, last.shape[1:3], align_corners=True)
    probs = BN.cond_log_binomial(
        params["conditional_log_binomial"], last, emb_up,
        n_classes=cfg.n_bins, min_temp=cfg.min_temp, max_temp=cfg.max_temp)
    centers_up = interpolate(b_centers, probs.shape[1:3], align_corners=True)
    metric = jnp.sum(probs * centers_up, axis=-1)
    return {"metric_depth": metric, "rel_depth": core["rel_depth"]}


# ---------------------------------------------------------------------------
# MidasCore prep (midas.py:143-188): keep-aspect "minimal" resize to
# multiples of 32, then (x - 0.5) / 0.5 normalization

def _constrain_multiple_of(x: float, multiple: int = 32) -> int:
    return int(np.round(x / multiple) * multiple)


def prep_size(h: int, w: int, net_hw=(384, 512),
              keep_aspect_ratio: bool = True) -> tuple:
    """Resize target (midas.py Resize.get_size, resize_method='minimal')."""
    net_h, net_w = net_hw
    scale_h = net_h / h
    scale_w = net_w / w
    if keep_aspect_ratio:
        if abs(1 - scale_w) < abs(1 - scale_h):
            scale_h = scale_w
        else:
            scale_w = scale_h
    new_h = _constrain_multiple_of(scale_h * h)
    new_w = _constrain_multiple_of(scale_w * w)
    return max(new_h, 32), max(new_w, 32)


def infer_depth(params: dict, cfg: ZoeConfig, image: np.ndarray,
                pad_input: bool = True, with_flip_aug: bool = True,
                _forward=None) -> np.ndarray:
    """(H, W, 3) float [0,1] image -> (H, W) metric depth.  Reproduces
    DepthModel.infer (depth_model.py:115-130) -> _infer_with_pad_aug
    (:58-99): reflect pad, prep resize, forward, bicubic back, crop, and
    horizontal-flip averaging."""
    x = jnp.asarray(image, jnp.float32)[None]          # (1, H, W, 3)

    # the prep size depends on the (padded) source aspect ratio; the BEiT
    # rel-pos biases are re-materialized once for that window
    H0, W0 = x.shape[1:3]
    if pad_input:
        pH = int(np.sqrt(H0 / 2) * 3)
        pW = int(np.sqrt(W0 / 2) * 3)
    else:
        pH = pW = 0
    th, tw = prep_size(H0 + 2 * pH, W0 + 2 * pW, cfg.img_size)
    if (th // 16, tw // 16) != cfg.window:
        from .beit import specialize_window
        params = dict(params)
        params["backbone"] = specialize_window(
            params["backbone"], cfg.window, (th // 16, tw // 16))
        cfg = cfg._replace(img_size=(th, tw))

    def infer_pad(xi):
        h, w = xi.shape[1:3]
        if pad_input:
            pad_h = int(np.sqrt(h / 2) * 3)
            pad_w = int(np.sqrt(w / 2) * 3)
            xi = jnp.pad(xi, ((0, 0), (pad_h, pad_h), (pad_w, pad_w),
                              (0, 0)), mode="reflect")
        ph, pw = xi.shape[1:3]
        net_in = interpolate(xi, (th, tw), align_corners=True)
        net_in = (net_in - 0.5) / 0.5
        fwd = _forward or (lambda p, c, v: zoedepth_forward(p, c, v))
        out = fwd(params, cfg, net_in)["metric_depth"][..., None]
        if out.shape[1:3] != (ph, pw):
            out = interpolate(out, (ph, pw), align_corners=False,
                              mode="bicubic")
        if pad_input:
            out = out[:, pad_h:ph - pad_h if pad_h else ph,
                      pad_w:pw - pad_w if pad_w else pw]
        return out[..., 0]

    out = infer_pad(x)
    if with_flip_aug:
        out_flip = infer_pad(x[:, :, ::-1])
        out = (out + out_flip[:, :, ::-1]) / 2.0
    return np.asarray(out[0])
