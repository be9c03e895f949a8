"""2D Eulerian flow estimation for stage 1.

The reference runs a SPADE-UNet motion model (3d-cinemagraphy) whose INPUT is
a dense 'hint' field: sparse user motion arrows splatted with a shared
gaussian weight, restricted to the fluid mask (cinemagraphy demo.py:24-105).
Backends:

- ``spade``: the full ported network (motion/spade.py) with the reference's
  exact pre/post-processing: image bicubic-resized to 768^2 and normalized
  to [-1,1] (demo.py:108-117), hints densified at native res then scaled +
  resized to 768^2 with an area-resized float mask (demo.py:99-105), one
  15x15 constant-border box blur of the masked prediction — the reference's
  7-iteration loop never feeds back, so it equals a single blur
  (renderer.py:600-602) — then value-scaled and resized to native res
  (renderer.py:604-606).  Runs with converted sceneflow_model.pth weights
  when available, deterministic random weights otherwise.
- ``hints`` (weight-free default): the densified hint field itself plus the
  same post-smoothing — a faithful approximation when no checkpoint exists.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

MOTION_W = 768            # config.yaml generator.motionH/motionW/W


def densify_hints(hints_start: np.ndarray, hints_end: np.ndarray,
                  mask: np.ndarray, height: int, width: int,
                  rng: np.random.RandomState | None = None) -> jnp.ndarray:
    """Gaussian-weighted scatter of hint motions — exact port of
    generate_mask_hints_from_user (demo.py:24-100):

    - motion per hint = (end - start) / 50            (demo.py:70)
    - one shared sigma ~ randint[H/(2m), 2H/m)        (demo.py:88)
    - weight = exp(-(dist/sigma)^2)                   (demo.py:92)
    - zero-weight pixels keep denominator 1           (demo.py:95)
    - masked at native resolution                     (demo.py:97)

    Returns (H, W, 2) per-frame displacement (x, y)."""
    rng = rng or np.random.RandomState(0)
    if len(hints_start) == 0:
        hints_start = np.zeros((1, 2), np.float32)
        hints_end = np.zeros((1, 2), np.float32)
    m = len(hints_start)
    sigma = float(rng.randint(max(height // (2 * m), 1),
                              max(int(height // (m / 2)), 2)))

    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    num = jnp.zeros((height, width, 2))
    den = jnp.zeros((height, width, 1))
    for k in range(m):
        hx, hy = int(hints_start[k][0]), int(hints_start[k][1])
        motion = (np.asarray(hints_end[k], np.float64)
                  - np.asarray(hints_start[k], np.float64)) / 50.0
        dist = jnp.sqrt((xs - hx) ** 2 + (ys - hy) ** 2)
        w = jnp.exp(-(dist / sigma) ** 2)[..., None]
        num = num + w * jnp.asarray(motion, jnp.float32)
        den = den + w
    den = jnp.where(den == 0.0, 1.0, den)
    dense = num / den
    return dense * (jnp.asarray(mask, jnp.float32) > 0)[..., None]


def _box_blur_constant(x: jnp.ndarray, size: int = 15) -> jnp.ndarray:
    """kornia box_blur(border_type='constant'): zero-padded mean filter."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                              (size, size, 1), (1, 1, 1), "SAME")
    return s / float(size * size)


@jax.jit
def reference_flow_postprocess(pred: jnp.ndarray,
                               mask: jnp.ndarray) -> jnp.ndarray:
    """renderer.py:598-602: mask, ONE 15x15 constant-border box blur (the
    loop discards all but the last identical result), mask again."""
    flow = pred * mask
    flow = _box_blur_constant(flow, 15)
    return flow * mask


@jax.jit
def smooth_and_mask_flow(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Post-smoothing for the weight-free hints backend: the reference's
    blur operator (see reference_flow_postprocess) plus a magnitude rescale
    so the blurred hint field keeps its authored speed."""
    mag_before = jnp.abs(flow).max()
    out = reference_flow_postprocess(flow, mask[..., None])
    mag_after = jnp.abs(out).max()
    return out * (mag_before / jnp.maximum(mag_after, 1e-8))


def _area_resize(x: jnp.ndarray, hw: tuple) -> jnp.ndarray:
    """torch F.interpolate(mode='area') == adaptive average pooling."""
    H, W = x.shape[0], x.shape[1]
    th, tw = hw

    def pool_matrix(in_size, out_size):
        M = np.zeros((out_size, in_size), np.float32)
        for j in range(out_size):
            a = int(np.floor(j * in_size / out_size))
            b = int(np.ceil((j + 1) * in_size / out_size))
            M[j, a:b] = 1.0 / (b - a)
        return jnp.asarray(M)

    Mh = pool_matrix(H, th)
    Mw = pool_matrix(W, tw)
    y = jnp.einsum("oh,hwc->owc", Mh, x)
    return jnp.einsum("pw,owc->opc", Mw, y)


class FlowEstimator:
    def __init__(self, backend: str = "hints", ckpt_path: str | None = None):
        if backend == "auto":
            if not (ckpt_path and os.path.exists(ckpt_path)):
                import sys
                print("[mom_tpu] WARNING: no SPADE-UNet checkpoint — using "
                      "the weight-free HINTS flow backend. Output quality is "
                      "NOT learned-flow quality; place sceneflow_model.pth "
                      "under the --cinema_ckpt dir to use real weights.",
                      file=sys.stderr, flush=True)
            backend = "spade" if (ckpt_path and os.path.exists(ckpt_path)) \
                else "hints"
        self.backend = backend
        self._spade = None
        if backend == "spade":
            from . import spade as SP
            if ckpt_path and os.path.exists(ckpt_path):
                import torch
                sd = torch.load(ckpt_path, map_location="cpu",
                                weights_only=False)
                if isinstance(sd, dict) and "netG" in sd:
                    sd = sd["netG"]
                self._spade = SP.from_torch_state(sd)
            else:
                self._spade = SP.init_spade_unet(jax.random.PRNGKey(0))
            self._fwd = jax.jit(SP.forward_flow)

    def estimate(self, image, mask: np.ndarray,
                 hints_start, hints_end, seed: int = 0) -> np.ndarray:
        """image: PIL.Image or (H, W, 3) array in [0,1]; returns
        (1, 2, H, W) float32 — the reference's T2C_flow layout
        (train_motion.py:84)."""
        H, W = mask.shape[:2]
        dense = densify_hints(np.asarray(hints_start, np.float32),
                              np.asarray(hints_end, np.float32),
                              mask, H, W, rng=np.random.RandomState(seed))
        if self.backend != "spade":
            flow = smooth_and_mask_flow(dense, jnp.asarray(mask, jnp.float32))
            return np.asarray(flow).transpose(2, 0, 1)[None]

        from ..nn.layers import interpolate
        # hint -> 768^2 with value scaling (demo.py:101-104)
        scale = jnp.asarray([MOTION_W / W, MOTION_W / H], jnp.float32)
        hint = interpolate((dense * scale)[None], (MOTION_W, MOTION_W),
                           align_corners=False)
        mask768 = _area_resize(
            (jnp.asarray(mask, jnp.float32) > 0).astype(jnp.float32)[..., None],
            (MOTION_W, MOTION_W))[None]
        img768 = _prep_image_768(image)
        pred = self._fwd(self._spade, img768, mask768, hint)
        flow = reference_flow_postprocess(pred[0], mask768[0])
        # back to native res with value scaling (renderer.py:604-606)
        flow = flow * jnp.asarray([W / MOTION_W, H / MOTION_W], jnp.float32)
        flow = interpolate(flow[None], (H, W), align_corners=False)[0]
        return np.asarray(flow).transpose(2, 0, 1)[None]


def _prep_image_768(image) -> jnp.ndarray:
    """torchvision Resize((768,768), BICUBIC) on the PIL image (antialiased,
    demo.py:110-115) + Normalize(0.5, 0.5)."""
    from PIL import Image
    if not isinstance(image, Image.Image):
        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        image = Image.fromarray(arr)
    image = image.convert("RGB").resize((MOTION_W, MOTION_W), Image.BICUBIC)
    x = np.asarray(image, np.float32) / 255.0
    return jnp.asarray((x - 0.5) / 0.5)[None]
