"""SPADE-UNet motion estimator (3d-cinemagraphy), NHWC JAX port.

Reference: thirdparty/cinemagraphy/lib/model/motion/
- motion_model.py:21-101  SPADEUnetMaskMotion.forward_flow (div_flow=1.0,
  6-channel input = RGB + moving mask + 2ch hint, config.yaml generator)
- architectures.py:612-778 SPADEUnet4MaskMotion: 8 stride-2 spectral-norm
  conv encoder, decoder with per-stage SPADE(InstanceNorm) conditioning on
  the raw network input, and the reference's channel-split upsampling quirk
  (channels [0:3] bilinear, [3:4] nearest, [4:] bilinear — applied to every
  FEATURE tensor, architectures.py:733-776; trained this way, reproduced
  exactly)
- networks.py:442-486  SPADE block (3x3 shared conv -> ReLU -> gamma/beta,
  segmap resized per channel group: RGB bilinear, mask nearest, hint
  bilinear)

Spectral norm folds into effective weights at conversion time
(weight_orig / sigma with the stored u/v, matching torch eval mode).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..nn.layers import conv2d, interpolate

NUM_FILTERS = 32
SPADE_HIDDEN = 128

_SPADE_NAMES = ("s1", "s2_0", "s2_1", "s4_0", "s4_1",
                "s8_0", "s8_1", "s8_2", "s8_3", "s8_4", "s8_5", "s8_6",
                "s8_7")


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    limit = float(np.sqrt(1.0 / fan_in))
    wk, bk = jax.random.split(key)
    return {"w": jax.random.uniform(wk, (kh, kw, cin, cout), jnp.float32,
                                    -limit * np.sqrt(3), limit * np.sqrt(3)),
            "b": jax.random.uniform(bk, (cout,), jnp.float32, -limit, limit)}


def init_spade_unet(key, channels_in: int = 6, channels_out: int = 2) -> dict:
    nf = NUM_FILTERS
    enc = [(channels_in, nf), (nf, nf * 2), (nf * 2, nf * 4),
           (nf * 4, nf * 8)] + [(nf * 8, nf * 8)] * 4
    dec = [(nf * 8, nf * 8)] + [(nf * 16, nf * 8)] * 3 + \
          [(nf * 16, nf * 4), (nf * 8, nf * 2), (nf * 4, nf),
           (nf * 2, channels_out)]
    spade_nc = [nf, nf * 2, nf * 2, nf * 4, nf * 4] + [nf * 8] * 8
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    params = {"enc": [], "dec": [], "spade": {}}
    for cin, cout in enc:
        params["enc"].append(_conv_init(next(ki), 4, 4, cin, cout))
    for cin, cout in dec:
        params["dec"].append(_conv_init(next(ki), 3, 3, cin, cout))
    for name, nc in zip(_SPADE_NAMES, spade_nc):
        params["spade"][name] = {
            "shared": _conv_init(next(ki), 3, 3, channels_in, SPADE_HIDDEN),
            "gamma": _conv_init(next(ki), 3, 3, SPADE_HIDDEN, nc),
            "beta": _conv_init(next(ki), 3, 3, SPADE_HIDDEN, nc),
        }
    return params


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """nn.InstanceNorm2d(affine=False): per-sample per-channel over H, W."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _resize_segmap(segmap: jnp.ndarray, hw: tuple) -> jnp.ndarray:
    """networks.py:463-477: RGB bilinear(align=False), mask nearest, hint
    bilinear, by channel group."""
    if segmap.shape[1:3] == hw:
        return segmap
    c = segmap.shape[-1]
    rgb = interpolate(segmap[..., :3], hw, align_corners=False)
    if c == 3:
        return rgb
    mask = _nearest(segmap[..., 3:4], hw)
    if c == 4:
        return jnp.concatenate([rgb, mask], axis=-1)
    hint = interpolate(segmap[..., 4:], hw, align_corners=False)
    return jnp.concatenate([rgb, mask, hint], axis=-1)


def _nearest(x: jnp.ndarray, hw: tuple) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') exact: src = floor(dst*in/out)."""
    H, W = x.shape[1], x.shape[2]
    rows = (np.arange(hw[0]) * H // hw[0]).astype(np.int32)
    cols = (np.arange(hw[1]) * W // hw[1]).astype(np.int32)
    return x[:, rows][:, :, cols]


def _spade(p: dict, x: jnp.ndarray, segmap: jnp.ndarray) -> jnp.ndarray:
    seg = _resize_segmap(segmap, x.shape[1:3])
    act = jax.nn.relu(conv2d(p["shared"], seg, padding=1))
    gamma = conv2d(p["gamma"], act, padding=1)
    beta = conv2d(p["beta"], act, padding=1)
    return _instance_norm(x) * (1 + gamma) + beta


def _up_mixed(x: jnp.ndarray) -> jnp.ndarray:
    """The reference's channel-split x2 upsample (architectures.py:733):
    [0:3] bilinear(align=False), [3:4] nearest, [4:] bilinear."""
    hw = (x.shape[1] * 2, x.shape[2] * 2)
    a = interpolate(x[..., :3], hw, align_corners=False)
    b = jnp.repeat(jnp.repeat(x[..., 3:4], 2, axis=1), 2, axis=2)
    c = interpolate(x[..., 4:], hw, align_corners=False)
    return jnp.concatenate([a, b, c], axis=-1)


def spade_unet_forward(params: dict, net_in: jnp.ndarray) -> jnp.ndarray:
    """net_in: (B, H, W, 6) = [RGB in [-1,1], moving mask, hint x, hint y].
    Returns (B, H, W, 2) motion (architectures.py:708-778)."""
    lrelu = lambda t: jax.nn.leaky_relu(t, 0.2)
    relu = jax.nn.relu
    enc = params["enc"]
    dec = params["dec"]
    sp = params["spade"]

    def down(p, t):
        return conv2d(p, t, stride=2, padding=1)

    e1 = down(enc[0], net_in)
    e2 = _spade(sp["s2_0"], down(enc[1], lrelu(e1)), net_in)
    e3 = _spade(sp["s4_0"], down(enc[2], lrelu(e2)), net_in)
    e4 = _spade(sp["s8_0"], down(enc[3], lrelu(e3)), net_in)
    e5 = _spade(sp["s8_1"], down(enc[4], lrelu(e4)), net_in)
    e6 = _spade(sp["s8_2"], down(enc[5], lrelu(e5)), net_in)
    e7 = _spade(sp["s8_3"], down(enc[6], lrelu(e6)), net_in)
    e8 = down(enc[7], lrelu(e7))

    e8 = _up_mixed(relu(e8))
    d1_ = _up_mixed(_spade(sp["s8_4"], conv2d(dec[0], e8, padding=1), net_in))
    d1 = relu(jnp.concatenate([d1_, _up_mixed(e7)], axis=-1))
    d2_ = _up_mixed(_spade(sp["s8_5"], conv2d(dec[1], d1, padding=1), net_in))
    d2 = relu(jnp.concatenate([d2_, _up_mixed(e6)], axis=-1))
    d3_ = _up_mixed(_spade(sp["s8_6"], conv2d(dec[2], d2, padding=1), net_in))
    d3 = relu(jnp.concatenate([d3_, _up_mixed(e5)], axis=-1))
    d4_ = _up_mixed(_spade(sp["s8_7"], conv2d(dec[3], d3, padding=1), net_in))
    d4 = relu(jnp.concatenate([d4_, _up_mixed(e4)], axis=-1))
    d5_ = _up_mixed(_spade(sp["s4_1"], conv2d(dec[4], d4, padding=1), net_in))
    d5 = relu(jnp.concatenate([d5_, _up_mixed(e3)], axis=-1))
    d6_ = _up_mixed(_spade(sp["s2_1"], conv2d(dec[5], d5, padding=1), net_in))
    d6 = relu(jnp.concatenate([d6_, _up_mixed(e2)], axis=-1))
    d7_ = _up_mixed(_spade(sp["s1"], conv2d(dec[6], d6, padding=1), net_in))
    d7 = relu(jnp.concatenate([d7_, _up_mixed(e1)], axis=-1))
    return conv2d(dec[7], d7, padding=1)


def forward_flow(params: dict, image: jnp.ndarray, mask: jnp.ndarray,
                 hint: jnp.ndarray, div_flow: float = 1.0) -> jnp.ndarray:
    """motion_model.py:85-101: concat input, predict, scale by div_flow.
    image (B,H,W,3) in [-1,1]; mask (B,H,W,1); hint (B,H,W,2)."""
    net_in = jnp.concatenate([image, mask, hint], axis=-1)
    return spade_unet_forward(params, net_in) * div_flow


# ---------------------------------------------------------------------------
# torch state-dict conversion (sceneflow_model.pth['netG'])

def _fold_spectral(sd: dict, key: str):
    """Effective eval-mode weight of a spectral_norm'd conv: weight_orig /
    (u^T W v) with the stored power-iteration vectors."""
    import numpy as _np
    if f"{key}.weight_orig" in sd:
        w = _np.asarray(sd[f"{key}.weight_orig"], _np.float32)
        u = _np.asarray(sd[f"{key}.weight_u"], _np.float32)
        v = _np.asarray(sd[f"{key}.weight_v"], _np.float32)
        sigma = float(u @ (w.reshape(w.shape[0], -1) @ v))
        w = w / sigma
    else:
        w = _np.asarray(sd[f"{key}.weight"], _np.float32)
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "b": jnp.asarray(_np.asarray(sd[f"{key}.bias"], _np.float32))}


def from_torch_state(sd: dict) -> dict:
    """SPADEUnetMaskMotion state dict -> our pytree.  Accepts the 'netG'
    payload of ckpts/sceneflow_model.pth (demo.py:191-193) or a raw
    module state dict (keys with or without 'motion_predictor.')."""
    def a(x):
        return np.asarray(x.detach().cpu() if hasattr(x, "detach") else x,
                          np.float32)
    sd = {k: a(v) for k, v in sd.items()}
    pre = ("motion_predictor."
           if any(k.startswith("motion_predictor.") for k in sd) else "")
    params = {"enc": [], "dec": [], "spade": {}}
    for i in range(1, 9):
        params["enc"].append(_fold_spectral(sd, f"{pre}conv{i}"))
    for i in range(1, 9):
        params["dec"].append(_fold_spectral(sd, f"{pre}dconv{i}"))
    torch_names = ["spade_layer", "spade_layer2_0", "spade_layer2_1",
                   "spade_layer4_0", "spade_layer4_1"] + \
                  [f"spade_layer8_{i}" for i in range(8)]
    for ours, theirs in zip(_SPADE_NAMES, torch_names):
        params["spade"][ours] = {
            "shared": _fold_spectral(sd, f"{pre}{theirs}.mlp_shared.0"),
            "gamma": _fold_spectral(sd, f"{pre}{theirs}.mlp_gamma"),
            "beta": _fold_spectral(sd, f"{pre}{theirs}.mlp_beta"),
        }
    return params
