"""LPIPS perceptual distance (AlexNet backbone) in JAX.

The reference wires LPIPS as a dormant default: utils/loss_utils.py:20-22
defines lpips_loss(img1, img2, lpips_model), train_4DGS.py:81 comments out
``lpips.LPIPS(net="alex")`` and lambda_lpips defaults to 0
(arguments/__init__.py:134).  This module provides the live equivalent: the
standard LPIPS-alex architecture (Zhang et al. 2018, as implemented by the
``lpips`` pip package the reference imports) with

- a pure-JAX forward (jit/vjp friendly, NHWC, XLA convs)
- a torch state-dict converter accepting the lpips package's key layout
  (``net.slice{k}.{i}.weight`` / ``lin{k}.model.1.weight``) so the published
  calibration weights load directly when a checkpoint is available
- deterministic random init for weight-free environments (this machine has
  no egress; random-feature LPIPS still yields a usable perceptual metric).

Architecture: images scaled to [-1,1], normalized by the LPIPS shift/scale
buffers, passed through the 5 AlexNet conv stages; each ReLU tap is
channel-unit-normalized, squared-differenced, 1x1-conv-weighted (lin layers)
and spatially averaged; the 5 tap scores sum to the distance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature config: (out_ch, kernel, stride, pad), maxpool(3, 2) after
# stages 1 and 2 (torchvision alexnet.features used by the lpips package).
_ALEX_STAGES = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_CHANNELS = (64, 192, 384, 256, 256)

# scaling_layer buffers (lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips(key=None) -> dict:
    """Random-init LPIPS-alex parameters (kaiming-uniform convs like torch's
    default; lin weights positive uniform as the package initializes)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    params = {"conv": [], "lin": []}
    in_ch = 3
    for out_ch, k, _, _ in _ALEX_STAGES:
        key, wk, bk = jax.random.split(key, 3)
        fan_in = in_ch * k * k
        limit = float(np.sqrt(1.0 / fan_in))
        w = jax.random.uniform(wk, (k, k, in_ch, out_ch), jnp.float32,
                               -limit * np.sqrt(3), limit * np.sqrt(3))
        b = jax.random.uniform(bk, (out_ch,), jnp.float32, -limit, limit)
        params["conv"].append({"w": w, "b": b})
        in_ch = out_ch
    for ch in _CHANNELS:
        key, wk = jax.random.split(key)
        params["lin"].append(jax.random.uniform(wk, (ch,), jnp.float32,
                                                0.0, 2.0 / ch))
    return params


def from_torch_state(sd: dict) -> dict:
    """Convert an ``lpips.LPIPS(net='alex')`` state dict.  Conv keys live at
    net.slice{1..5}.{idx}.weight (torch OIHW) and calibration weights at
    lin{0..4}.model.1.weight (1x1 conv, shape (1, C, 1, 1))."""
    def a(x):
        return jnp.asarray(np.asarray(x.detach().cpu()
                                      if hasattr(x, "detach") else x),
                           jnp.float32)

    # slice{k} are torch Sequentials whose conv indices (within torchvision
    # alexnet.features numbering) are:
    conv_keys = ["net.slice1.0", "net.slice2.3", "net.slice3.6",
                 "net.slice4.8", "net.slice5.10"]
    params = {"conv": [], "lin": []}
    for ck in conv_keys:
        w = a(sd[f"{ck}.weight"])            # (O, I, H, W)
        b = a(sd[f"{ck}.bias"])
        params["conv"].append({"w": jnp.transpose(w, (2, 3, 1, 0)), "b": b})
    for i in range(5):
        w = a(sd[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        params["lin"].append(w.reshape(-1))
    return params


def _conv(x, p, stride, pad):
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def _maxpool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _features(params, x):
    """x: (N, H, W, 3) in [-1, 1] -> list of 5 ReLU taps."""
    x = (x - _SHIFT) / _SCALE
    taps = []
    for i, (out_ch, k, stride, pad) in enumerate(_ALEX_STAGES):
        x = jax.nn.relu(_conv(x, params["conv"][i], stride, pad))
        taps.append(x)
        if i in (0, 1):
            x = _maxpool(x)
    return taps


def _unit_normalize(x, eps=1e-10):
    return x / (jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + eps)


def lpips_distance(params: dict, img0: jnp.ndarray, img1: jnp.ndarray):
    """img0/img1: (..., H, W, 3) in [0, 1] -> scalar mean LPIPS distance
    (the reference's lpips_loss takes .mean(), utils/loss_utils.py:20-22)."""
    i0 = img0.reshape((-1,) + img0.shape[-3:]) * 2.0 - 1.0
    i1 = img1.reshape((-1,) + img1.shape[-3:]) * 2.0 - 1.0
    f0 = _features(params, i0)
    f1 = _features(params, i1)
    total = 0.0
    for t0, t1, lin in zip(f0, f1, params["lin"]):
        d = _unit_normalize(t0) - _unit_normalize(t1)
        # lin layer = 1x1 conv with non-negative weights, then spatial mean
        score = jnp.mean(jnp.sum(d * d * lin, axis=-1), axis=(1, 2))
        total = total + score
    return jnp.mean(total)


def load_lpips(path: str | None = None, key=None) -> dict:
    """Load converted weights from a torch checkpoint if one exists on this
    machine, else deterministic random init."""
    if path is not None:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        return from_torch_state(sd)
    return init_lpips(key)
