"""Feature warping for cinemagraph looping — exact port of
utils/cinemagraph_utils.py:

- euler_integration (:9-70): NEAREST-rounded advection with sticky
  out-of-bounds reset to zero displacement (differs from the cinemagraphy
  package's variant in motion/euler.py)
- pad_tensor / crop_padded_tensor (:60-82): reflection pad by 3/8 of size
- resize_flow / resize_feature (:86-127): repeated x2 bilinear steps with
  /2 (down) or *2 (up) value scaling per step
- blend_feature (:130-178): cut borders at high res, reflect-pad, integrate
  +/- flow to frames idx and n-1-idx, LINEAR joint splatting with
  (1-alpha)/alpha importance
- feature_inpaint_conv (:498-538): where the warped coverage mask is zero,
  fill with a 7x7 box filter of the blended feature
- warp_one_level (:181-190): the per-level composition.

All tensors NHWC with a leading batch of 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...nn.layers import interpolate


def euler_integrate_nearest(motion: jnp.ndarray, steps) -> jnp.ndarray:
    """motion (H, W, 2) -> displacement (H, W, 2).  Exact
    cinemagraph_utils.euler_integration semantics: sample the motion at the
    ROUNDED current position; once a trajectory leaves the image its
    displacement resets to zero permanently (:42-52).

    ``steps`` may be a traced int32 — a fori_loop keeps one compiled
    program for all 120 frame indices of a looping video."""
    H, W = motion.shape[:2]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    coord = jnp.stack([xs, ys], 0)                   # (2, H, W)
    mx = motion[..., 0]
    my = motion[..., 1]

    def body(_, carry):
        dest, invalid = carry
        ix = jnp.clip(jnp.round(dest[0]).astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(jnp.round(dest[1]).astype(jnp.int32), 0, H - 1)
        step = jnp.stack([mx[iy, ix], my[iy, ix]], 0)
        dest = dest + step
        oob = ((dest[0] > W - 1) | (dest[0] < 0)
               | (dest[1] > H - 1) | (dest[1] < 0))
        invalid = invalid | oob
        dest = jnp.where(invalid[None], coord, dest)
        return (dest, invalid)

    dest, _ = jax.lax.fori_loop(
        0, steps, body, (coord, jnp.zeros((H, W), bool)))
    return jnp.stack([dest[0] - xs, dest[1] - ys], -1)


def pad_reflect(x: jnp.ndarray) -> jnp.ndarray:
    """pad_tensor(mode='reflect'): pad by size/4 + size/8 (:60-72)."""
    size = x.shape[1]
    p = size // 4 + size // 8
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def crop_padded(x: jnp.ndarray, size: int) -> jnp.ndarray:
    padded = x.shape[1] - size
    s = padded // 2
    return x[:, s:s + size, s:s + size, :]


def resize_flow(flow: jnp.ndarray, size: int) -> jnp.ndarray:
    """(1, h, w, 2) -> (1, size, size, 2) by repeated x2 / half steps with
    per-step value scaling (:105-127)."""
    while flow.shape[1] != size:
        h = flow.shape[1]
        if h > size:
            flow = interpolate(flow, (h // 2, h // 2),
                               align_corners=False) / 2.0
        else:
            flow = interpolate(flow, (h * 2, h * 2),
                               align_corners=False) * 2.0
    return flow


def resize_feature(feat: jnp.ndarray, size: int) -> jnp.ndarray:
    """(:86-102): upsample doubles until >= size; downsample is a single
    half step (the reference's loopless branch)."""
    if feat.shape[1] < size:
        while feat.shape[1] < size:
            feat = interpolate(feat, (feat.shape[1] * 2, feat.shape[2] * 2),
                               align_corners=False)
    elif feat.shape[1] > size:
        feat = interpolate(feat, (feat.shape[1] // 2, feat.shape[2] // 2),
                           align_corners=False)
    return feat


def _linear_joint_splat(feat1, z1, flow1, feat2, z2, flow2, out_hw):
    """joint_splatting (joint_splatting.py:23-51) with
    FunctionSoftsplat(strType='linear') semantics: bilinear forward scatter
    of metric-weighted features from both sources into the SAME output
    frame, normalization denominator forced to 1 where exactly 0
    (softmax_splatting.py:333-344) so uncovered pixels read as feature 0."""
    H, W = out_hw
    C = feat1.shape[-1]
    ys, xs = jnp.meshgrid(jnp.arange(feat1.shape[1], dtype=jnp.float32),
                          jnp.arange(feat1.shape[2], dtype=jnp.float32),
                          indexing="ij")
    out = jnp.zeros((H * W, C + 1), jnp.float32)
    for feat, z, flow in ((feat1, z1, flow1), (feat2, z2, flow2)):
        vals = jnp.concatenate([feat[0] * z[0], z[0]], -1).reshape(-1, C + 1)
        u = (xs + flow[0, ..., 0]).reshape(-1)
        v = (ys + flow[0, ..., 1]).reshape(-1)
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
    out = out.reshape(1, H, W, C + 1)
    denom = out[..., -1:]
    denom = jnp.where(denom == 0.0, 1.0, denom)
    return out[..., :-1] / denom


def blend_feature(feature: jnp.ndarray, flow: jnp.ndarray, idx: int,
                  n_frames: int) -> jnp.ndarray:
    """(:130-178).  feature (1, s, s, C), flow (1, s, s, 2) at the same
    resolution."""
    size = feature.shape[1]
    alpha = idx / (n_frames - 1)
    cut = {1024: 3, 512: 2, 256: 1}.get(size, 0)
    if cut:
        feature = feature[:, cut:-cut, cut:-cut, :]
        flow = flow[:, cut:-cut, cut:-cut, :]

    future_flow = pad_reflect(flow)
    past_flow = pad_reflect(-flow)
    future_flow = euler_integrate_nearest(future_flow[0], idx)[None]
    past_flow = euler_integrate_nearest(past_flow[0],
                                        n_frames - idx - 1)[None]

    ones = jnp.ones((1, size - 2 * cut, size - 2 * cut, 1), jnp.float32)
    future_z = pad_reflect(ones) * (1.0 - alpha)
    past_z = pad_reflect(ones) * alpha

    feature = pad_reflect(feature)
    return _linear_joint_splat(feature, future_z, future_flow,
                               feature, past_z, past_flow,
                               feature.shape[1:3])


def feature_inpaint_conv(feature: jnp.ndarray, flow: jnp.ndarray, idx: int,
                         n_frames: int) -> jnp.ndarray:
    """(:498-538): 7x7 box-fill where the warped all-ones coverage is 0."""
    ones = jnp.ones((1,) + flow.shape[1:3] + (1,), jnp.float32)
    coverage = blend_feature(ones, flow, idx, n_frames)
    blank = (coverage == 0.0).astype(feature.dtype)
    k = jnp.ones((7, 7, 1, 1), jnp.float32) / 49.0
    C = feature.shape[-1]
    filt = jax.lax.conv_general_dilated(
        feature, jnp.tile(k, (1, 1, 1, C)), window_strides=(1, 1),
        padding=((3, 3), (3, 3)), feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return blank * filt + (1.0 - blank) * feature


def warp_one_level(out: jnp.ndarray, flow: jnp.ndarray, idx: int,
                   n_frames: int) -> jnp.ndarray:
    """(:181-190).  out (1, s, s, C); flow (1, S, S, 2) at any power-of-two
    resolution."""
    orig = out.shape[1]
    flow = resize_flow(flow, orig)
    out = blend_feature(out, flow, idx, n_frames)
    out = feature_inpaint_conv(out, flow, idx, n_frames)
    return crop_padded(out, orig)
