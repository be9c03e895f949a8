"""Looping cinemagraph video generation.

The reference generates video frames by GAN inversion + feature-space
warping inside StyleGAN2 (StyleCineGAN main_jih.py:27-179,
warp_blend_feature model.py:573-700).  Backends:

- ``stylegan``: the full ported pipeline (motion/stylegan): resize image /
  flow / mask to 1024^2 (main_jih.py:32-40), fs-encoder GAN inversion
  (utils.py:19-34), per-frame warp_blend_feature with per-level euler
  integration + linear joint splatting + box inpainting, then composite
  result*mask + input*(1-mask) (main_jih.py:154-161).  Runs with converted
  sg2-lhq-1024.pt / fs-encoder weights when available, deterministic random
  weights otherwise.
- ``pixel`` (weight-free default): the same motion operator applied at
  pixel level — no network weights needed, seamless loop.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from .euler import euler_integrate
from .splat import joint_splatting


def generate_loop_frames(image: np.ndarray, flow: np.ndarray,
                         mask: np.ndarray, n_frames: int = 120,
                         backend: str = "pixel",
                         sg2_ckpt: str | None = None,
                         encoder_ckpt: str | None = None) -> list[np.ndarray]:
    """image (H, W, 3) [0,1]; flow (H, W, 2) per-frame displacement;
    mask (H, W) in {0,1} fluid region.  Returns n_frames (H, W, 3) arrays.
    Frame composition: result*mask + input*(1-mask) (main_jih.py:161)."""
    if backend == "auto":
        backend = "stylegan" if (sg2_ckpt and os.path.exists(sg2_ckpt)) \
            else "pixel"
        if backend == "pixel":
            import sys
            print("[mom_tpu] WARNING: no StyleGAN2 checkpoint — using the "
                  "weight-free PIXEL-WARP video backend. Output quality is "
                  "NOT StyleCineGAN quality; place sg2-lhq-1024.pt under "
                  "the --cinema_ckpt dir to use real weights.",
                  file=sys.stderr, flush=True)
    if backend == "stylegan":
        return _stylegan_loop_frames(image, flow, mask, n_frames,
                                     sg2_ckpt, encoder_ckpt)
    img = jnp.asarray(image, jnp.float32)
    m = jnp.asarray(mask, jnp.float32)[..., None]
    flow_j = jnp.asarray(flow, jnp.float32) * m

    frames = [np.asarray(img)]
    for t in range(1, n_frames):
        alpha = 1.0 - t / float(n_frames)
        disp_fwd = euler_integrate(flow_j, t)
        disp_bwd = euler_integrate(-flow_j, n_frames - t)
        # importance: Z = (1-alpha)/alpha flavored weights in log space
        z_fwd = jnp.full(img.shape[:2] + (1,),
                         float(np.log(max(alpha, 1e-6))))
        z_bwd = jnp.full(img.shape[:2] + (1,),
                         float(np.log(max(1.0 - alpha, 1e-6))))
        warped = joint_splatting(img, z_fwd, disp_fwd,
                                 img, z_bwd, disp_bwd)
        # fill any un-hit pixels with the source image before masking
        hit = joint_splatting(jnp.ones_like(img[..., :1]), z_fwd, disp_fwd,
                              jnp.ones_like(img[..., :1]), z_bwd, disp_bwd)
        warped = jnp.where(hit > 0.5, warped, img)
        out = warped * m + img * (1.0 - m)
        frames.append(np.asarray(jnp.clip(out, 0, 1)))
    return frames


def _stylegan_loop_frames(image, flow, mask, n_frames, sg2_ckpt,
                          encoder_ckpt) -> list[np.ndarray]:
    """main_jih.py:27-179 VideoGenerator."""
    from PIL import Image
    from ..nn.layers import interpolate
    from . import stylegan as SG
    from .stylegan.warp import warp_one_level, resize_flow, resize_feature

    cfg = SG.GeneratorConfig()
    if sg2_ckpt and os.path.exists(sg2_ckpt):
        gen = SG.convert.load_g_ema(sg2_ckpt, cfg)
    else:
        gen = SG.init_generator(jax.random.PRNGKey(0), cfg)
    if encoder_ckpt and os.path.exists(encoder_ckpt):
        enc = SG.convert.load_fs_encoder_ckpt(encoder_ckpt)
    else:
        enc = SG.init_fs_encoder(jax.random.PRNGKey(1))

    H, W = np.asarray(mask).shape[:2]
    # resize inputs to 1024^2 (main_jih.py:32-40); the image resize uses PIL
    # like read_image, the flow a value-scaled bilinear
    img_u8 = (np.clip(np.asarray(image, np.float32), 0, 1) * 255
              ).astype(np.uint8)
    img1024 = np.asarray(Image.fromarray(img_u8).resize((1024, 1024),
                                                        Image.BICUBIC),
                         np.float32) / 255.0
    torch_input = jnp.asarray(img1024 * 2.0 - 1.0)[None]       # [-1, 1]
    flow1024 = interpolate(jnp.asarray(flow, jnp.float32)[None],
                           (1024, 1024), align_corners=False)
    flow1024 = flow1024 * jnp.asarray([1024.0 / W, 1024.0 / H])
    mask1024 = np.asarray(Image.fromarray(
        (np.asarray(mask, np.float32) * 255).astype(np.uint8)).resize(
        (1024, 1024), Image.BILINEAR), np.float32)[None, :, :, None] / 255.0
    mask1024 = jnp.asarray(mask1024)

    # GAN inversion: encoder consumes the 256^2 downscale (trainer.py:38)
    enc_in = interpolate(torch_input, (512, 512), align_corners=False)
    enc_in = interpolate(enc_in, (256, 256), align_corners=False)
    latent, feature = SG.fs_encode(enc, enc_in)

    @jax.jit
    def render_frame(idx):
        def warp_fn(x):
            return warp_one_level(x, flow1024, idx, n_frames)
        out = SG.warp_blend_feature(gen, cfg, latent, feature, warp_fn)
        up_mask = resize_feature(mask1024, 1024)
        result = out * up_mask + torch_input * (1 - up_mask)
        return jnp.clip((result[0] + 1.0) * 0.5, 0.0, 1.0)

    frames1024 = []
    for idx in range(n_frames):
        frames1024.append(render_frame(jnp.asarray(idx, jnp.int32)))
    # back to the source resolution for the stage-2 contract
    frames = []
    for f in frames1024:
        fr = interpolate(f[None], (H, W), align_corners=False)[0]
        frames.append(np.asarray(fr))
    return frames
