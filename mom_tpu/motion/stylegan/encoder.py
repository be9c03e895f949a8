"""Feature-style encoder (fs_encoder_v2 over an iresnet50 trunk), NHWC.

Reference: external_modules/feature_style_encoder/nets/
feature_style_encoder.py:98-202 (fs_encoder_v2, idx_k=9, fs_stride=2) and
arcface/iresnet.py:28-120 (IBasicBlock / IResNet, layers (3, 4, 14, 3)).

Inference-only: BatchNorms run in eval mode, so the converter folds each BN
into a per-channel scale/shift; PReLU keeps its per-channel slopes.  The
encoder consumes a 256x256 image in [-1, 1] (the trainer downscales the
1024 input by scale=2 power-of-two bilinear steps, trainer.py:38,188-200)
and returns (18, 512) W+ offsets (dlatent_avg added by the caller) plus the
(1, 64, 64, 512) content feature injected at generator level 9.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IRESNET50_LAYERS = (3, 4, 14, 3)
_PLANES = (64, 128, 256, 512)


def _conv_init(key, kh, kw, cin, cout):
    w = 0.1 * jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
    return {"w": w}


def _bn_init(c):
    return {"scale": jnp.ones(c, jnp.float32),
            "shift": jnp.zeros(c, jnp.float32)}


def _prelu_init(c):
    return jnp.full(c, 0.25, jnp.float32)


def init_fs_encoder(key, n_styles: int = 18) -> dict:
    keys = jax.random.split(key, 256)
    ki = iter(keys)

    def block(cin, cout, stride):
        p = {"bn1": _bn_init(cin),
             "conv1": _conv_init(next(ki), 3, 3, cin, cout),
             "bn2": _bn_init(cout), "prelu": _prelu_init(cout),
             "conv2": _conv_init(next(ki), 3, 3, cout, cout),
             "bn3": _bn_init(cout), "stride": stride}
        if stride != 1 or cin != cout:
            p["down_conv"] = _conv_init(next(ki), 1, 1, cin, cout)
            p["down_bn"] = _bn_init(cout)
        return p

    params = {
        "stem_conv": _conv_init(next(ki), 3, 3, 3, 64),
        "stem_bn": _bn_init(64), "stem_prelu": _prelu_init(64),
        "layers": [],
        "styles": [],
    }
    cin = 64
    for planes, n in zip(_PLANES, IRESNET50_LAYERS):
        blocks = [block(cin, planes, 2)]
        for _ in range(1, n):
            blocks.append(block(planes, planes, 1))
        params["layers"].append(blocks)
        cin = planes
    for _ in range(n_styles):
        k1 = next(ki)
        params["styles"].append({
            "w": 0.02 * jax.random.normal(k1, (960 * 9, 512), jnp.float32),
            "b": jnp.zeros(512, jnp.float32)})
    # content_layer (fs_stride=2, idx_k=9): BN, conv64->512, BN, PReLU,
    # conv512->512 stride2, BN
    params["content"] = {
        "bn0": _bn_init(64),
        "conv1": _conv_init(next(ki), 3, 3, 64, 512),
        "bn1": _bn_init(512), "prelu": _prelu_init(512),
        "conv2": _conv_init(next(ki), 3, 3, 512, 512),
        "bn2": _bn_init(512),
    }
    params["dlatent_avg"] = jnp.zeros(512, jnp.float32)
    return params


def _conv(p, x, stride=1, padding=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(p, x):
    return x * p["scale"] + p["shift"]


def _prelu(a, x):
    return jnp.where(x >= 0, x, a * x)


def _basic_block(p, x):
    out = _bn(p["bn1"], x)
    out = _conv(p["conv1"], out)
    out = _prelu(p["prelu"], _bn(p["bn2"], out))
    out = _bn(p["bn3"], _conv(p["conv2"], out, stride=p["stride"]))
    if "down_conv" in p:
        identity = _bn(p["down_bn"], _conv(p["down_conv"], x,
                                           stride=p["stride"], padding=0))
    else:
        identity = x
    return out + identity


def adaptive_avg_pool(x: jnp.ndarray, out: int = 3) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d bins: [floor(i*n/o), ceil((i+1)*n/o))."""
    H, W = x.shape[1], x.shape[2]

    def mat(n):
        M = np.zeros((out, n), np.float32)
        for j in range(out):
            a = int(np.floor(j * n / out))
            b = int(np.ceil((j + 1) * n / out))
            M[j, a:b] = 1.0 / (b - a)
        return jnp.asarray(M)

    y = jnp.einsum("oh,bhwc->bowc", mat(H), x)
    return jnp.einsum("pw,bowc->bopc", mat(W), y)


def _content_layer(p, x):
    h = _bn(p["bn0"], x)
    h = _conv(p["conv1"], h)
    h = _prelu(p["prelu"], _bn(p["bn1"], h))
    h = _conv(p["conv2"], h, stride=2)
    return _bn(p["bn2"], h)


def fs_encode(params: dict, x: jnp.ndarray):
    """x (1, 256, 256, 3) in [-1, 1] -> (latent (1, 18, 512) with
    dlatent_avg added, content (1, 64, 64, 512))."""
    h = _prelu(params["stem_prelu"],
               _bn(params["stem_bn"], _conv(params["stem_conv"], x)))
    feats = []
    content = None
    for li, blocks in enumerate(params["layers"]):
        for b in blocks:
            h = _basic_block(b, h)
        if li == 0:
            content = _content_layer(params["content"], h)
        feats.append(adaptive_avg_pool(h))
    # torch cat on the CHANNEL axis then flatten in NCHW order
    flat = jnp.concatenate(
        [jnp.transpose(f, (0, 3, 1, 2)).reshape(1, -1) for f in feats],
        axis=-1)                                            # (1, 960*9)
    latents = jnp.stack([flat @ s["w"] + s["b"] for s in params["styles"]],
                        axis=1)                             # (1, 18, 512)
    return latents + params["dlatent_avg"], content
