"""ZoeDepth metric-bins head layers, NHWC.

Exact ports of the vendored reference modules:
- SeedBinRegressorUnnormed / SeedBinRegressor
  (ZoeDepth/zoedepth/models/layers/localbins_layers.py:28-95)
- Projector (localbins_layers.py:98-114)
- AttractorLayerUnnormed / AttractorLayer + exp/inv attractors
  (ZoeDepth/zoedepth/models/layers/attractor.py:28-210)
- LogBinomial / ConditionalLogBinomial
  (ZoeDepth/zoedepth/models/layers/dist_layers.py:28-120)

All "convs" here are 1x1 (pointwise MLPs over pixels) — pure MXU matmuls.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...nn.layers import conv2d, gelu, softplus, interpolate


def _conv1x1_init(key, cin, cout):
    fan_in = cin
    limit = float(np.sqrt(1.0 / fan_in))
    wk, bk = jax.random.split(key)
    return {"w": jax.random.uniform(wk, (1, 1, cin, cout), jnp.float32,
                                    -limit * np.sqrt(3), limit * np.sqrt(3)),
            "b": jax.random.uniform(bk, (cout,), jnp.float32, -limit, limit)}


def _mlp2_init(key, cin, hidden, cout):
    k1, k2 = jax.random.split(key)
    return [_conv1x1_init(k1, cin, hidden), _conv1x1_init(k2, hidden, cout)]


# ---------------------------------------------------------------------------
# seed bin regressor

def init_seed_bin_regressor(key, in_features, n_bins=16, mlp_dim=256):
    return _mlp2_init(key, in_features, mlp_dim, n_bins)


def seed_bin_regressor_unnormed(p, x):
    """softplus bin centers (localbins_layers.py:66-95): returns
    (B_centers, B_centers)."""
    h = jax.nn.relu(conv2d(p[0], x))
    centers = softplus(conv2d(p[1], h))
    return centers, centers


def seed_bin_regressor_normed(p, x, min_depth, max_depth):
    """normed bin widths -> cumulative centers (localbins_layers.py:28-64).
    NHWC: channel (bins) axis is last."""
    h = jax.nn.relu(conv2d(p[0], x))
    B = jax.nn.relu(conv2d(p[1], h)) + 1e-3
    widths_normed = B / jnp.sum(B, axis=-1, keepdims=True)
    widths = (max_depth - min_depth) * widths_normed
    widths = jnp.pad(widths, ((0, 0), (0, 0), (0, 0), (1, 0)),
                     constant_values=min_depth)
    edges = jnp.cumsum(widths, axis=-1)
    centers = 0.5 * (edges[..., :-1] + edges[..., 1:])
    return widths_normed, centers


# ---------------------------------------------------------------------------
# projector

def init_projector(key, in_features, out_features, mlp_dim=128):
    return _mlp2_init(key, in_features, mlp_dim, out_features)


def projector(p, x):
    return conv2d(p[1], jax.nn.relu(conv2d(p[0], x)))


# ---------------------------------------------------------------------------
# attractors

def exp_attractor(dx, alpha, gamma):
    return jnp.exp(-alpha * jnp.abs(dx) ** gamma) * dx


def inv_attractor(dx, alpha, gamma):
    return dx / (1 + alpha * dx ** gamma)


# REFERENCE QUIRK (attractor.py:118-128, 193-201): every forward calls the
# jit-scripted attractor WITHOUT passing self.alpha/self.gamma, so the
# configured strengths (e.g. ZoeD_N's attractor_alpha=1000) are silently
# ignored and the script defaults always apply.  The released checkpoints
# were trained this way — reproduce it for parity.
_QUIRK_ALPHA = 300.0
_QUIRK_GAMMA = 2


def init_attractor(key, in_features, n_attractors, mlp_dim=128,
                   normed=False):
    out = n_attractors * 2 if normed else n_attractors
    return _mlp2_init(key, in_features, mlp_dim, out)


def attractor_layer_unnormed(p, x, b_prev, prev_b_embedding, *,
                             alpha=300.0, gamma=2, kind="sum",
                             attractor_type="exp"):
    """attractor.py:128-178 (AttractorLayerUnnormed.forward,
    interpolate=True).  b_prev: (B, h0, w0, nbins) unbounded centers."""
    if prev_b_embedding is not None:
        prev_b_embedding = interpolate(prev_b_embedding, x.shape[1:3],
                                       align_corners=True)
        x = x + prev_b_embedding
    A = softplus(conv2d(p[1], jax.nn.relu(conv2d(p[0], x))))   # (B,h,w,na)
    b_centers = interpolate(b_prev, x.shape[1:3], align_corners=True)
    dist = exp_attractor if attractor_type == "exp" else inv_attractor
    dx = A[..., :, None] - b_centers[..., None, :]     # (B,h,w,na,nb)
    del alpha, gamma                                   # see _QUIRK_ALPHA
    delta = dist(dx, _QUIRK_ALPHA, _QUIRK_GAMMA)
    delta_c = (jnp.sum(delta, axis=-2) if kind == "sum"
               else jnp.mean(delta, axis=-2))
    b_new = b_centers + delta_c
    return b_new, b_new


def attractor_layer_normed(p, x, b_prev, prev_b_embedding, *,
                           min_depth, max_depth, alpha=300.0, gamma=2,
                           kind="sum", attractor_type="exp"):
    """attractor.py:58-125 (AttractorLayer.forward): normalized bin centers
    in (0,1), scaled output centers."""
    if prev_b_embedding is not None:
        prev_b_embedding = interpolate(prev_b_embedding, x.shape[1:3],
                                       align_corners=True)
        x = x + prev_b_embedding
    A = jax.nn.relu(conv2d(p[1], jax.nn.relu(conv2d(p[0], x)))) + 1e-3
    B, h, w, c = A.shape
    A = A.reshape(B, h, w, c // 2, 2)
    # NOTE the reference computes A_normed then immediately overwrites it
    # with the raw first component (attractor.py:87-88) — reproduced
    A_normed = A[..., 0]
    b_prev = interpolate(b_prev, x.shape[1:3], align_corners=True)
    b_centers = b_prev
    dist = exp_attractor if attractor_type == "exp" else inv_attractor
    dx = A_normed[..., :, None] - b_centers[..., None, :]
    del alpha, gamma                                   # see _QUIRK_ALPHA
    delta = dist(dx, _QUIRK_ALPHA, _QUIRK_GAMMA)
    delta_c = (jnp.sum(delta, axis=-2) if kind == "sum"
               else jnp.mean(delta, axis=-2))
    b_new_centers = b_centers + delta_c
    B_centers = (max_depth - min_depth) * b_new_centers + min_depth
    B_centers = jnp.sort(B_centers, axis=-1)       # attractor.py:117
    B_centers = jnp.clip(B_centers, min_depth, max_depth)
    return b_new_centers, B_centers


# ---------------------------------------------------------------------------
# conditional log binomial

def init_cond_log_binomial(key, in_features, condition_dim,
                           bottleneck_factor=2):
    bottleneck = (in_features + condition_dim) // bottleneck_factor
    return _mlp2_init(key, in_features + condition_dim, bottleneck, 4)


def log_binom(n, k, eps=1e-7):
    n = n + eps
    k = k + eps
    return (n * jnp.log(n) - k * jnp.log(k)
            - (n - k) * jnp.log(n - k + eps))


def cond_log_binomial(p, x, cond, *, n_classes, min_temp=1e-7, max_temp=50.0,
                      p_eps=1e-4):
    """dist_layers.py:76-120.  x: (B,h,w,Cin), cond: (B,h,w,Ccond) ->
    (B,h,w,n_classes) probabilities."""
    h = conv2d(p[0], jnp.concatenate([x, cond], axis=-1))
    pt = softplus(conv2d(p[1], gelu(h)))
    pp, tt = pt[..., :2], pt[..., 2:]
    pp = pp + p_eps
    prob = pp[..., 0] / (pp[..., 0] + pp[..., 1])
    tt = tt + p_eps
    temp = tt[..., 0] / (tt[..., 0] + tt[..., 1])
    temp = (max_temp - min_temp) * temp + min_temp

    # LogBinomial (dist_layers.py:28-63)
    K = n_classes
    k_idx = jnp.arange(K, dtype=jnp.float32)
    prob = jnp.clip(prob, 1e-4, 1.0)[..., None]
    one_minus = jnp.clip(1.0 - prob, 1e-4, 1.0)
    y = (log_binom(jnp.asarray(K - 1.0), k_idx) + k_idx * jnp.log(prob)
         + (K - 1 - k_idx) * jnp.log(one_minus))
    return jax.nn.softmax(y / temp[..., None], axis=-1)
