"""JAX/TPU port of the ZoeDepth (ZoeD_N) metric depth stack.

Reference: /root/reference/ZoeDepth — hubconf.py:33 (ZoeD_N),
zoedepth/models/zoedepth/zoedepth_v1.py:38 (metric-bins head over MiDaS),
zoedepth/models/base_models/midas.py:191 (MidasCore over DPT_BEiT_L_384),
zoedepth/models/depth_model.py:58-151 (pad + flip augmented inference).

The DPT_BEiT_L_384 backbone itself is NOT vendored by the reference (it is a
torch.hub download, midas.py:343); the architecture here follows Intel's
official port of MiDaS 3.1 into transformers (BeitBackbone + DPTNeck +
DPTDepthEstimationHead), against which the parity tests run.
"""

from .model import ZoeConfig, init_zoedepth, zoedepth_forward, infer_depth

__all__ = ["ZoeConfig", "init_zoedepth", "zoedepth_forward", "infer_depth"]
