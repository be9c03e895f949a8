"""JAX/TPU port of the StyleCineGAN cinemagraph generator stack.

Reference: /root/reference/thirdparty/StyleCineGAN —
main_jih.py:27-179 (VideoGenerator), models/stylegan2/model.py (rosinality
StyleGAN2 generator + warp_blend_feature :573-700),
utils/cinemagraph_utils.py (warp_one_level/blend_feature/euler integration/
feature_inpaint_conv), external_modules/feature_style_encoder (fs encoder).

The CUDA fused ops (fused_bias_act, upfirdn2d) become plain XLA in ops.py —
they fuse naturally on TPU.
"""

from .generator import (GeneratorConfig, init_generator, style_forward,
                        synthesize, warp_blend_feature, mean_latent)
from .encoder import init_fs_encoder, fs_encode
from . import convert  # noqa: F401

__all__ = ["GeneratorConfig", "init_generator", "style_forward",
           "synthesize", "warp_blend_feature", "mean_latent",
           "init_fs_encoder", "fs_encode"]
