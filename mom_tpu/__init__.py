"""mom_tpu — a TPU-native JAX/XLA/Pallas framework for single-image-to-dynamic-video
4D Gaussian splatting, with the capabilities of cvsp-lab/ICLR2025_3D-MOM.

The pipeline has three stages, mirroring the reference CLIs
(train_motion.py / train_4DGS.py / render_4DGS.py at the repo root):

1. motion  — depth-based multi-view synthesis + 3D scene-flow optimization
2. train   — two-stage (coarse static / fine dynamic) 4D Gaussian optimization
             with a HexPlane deformation field
3. render  — novel-view video rendering along four camera trajectories

Everything on the compute path is jitted XLA or Pallas; host work is limited to
image / PLY / pickle IO.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry / compositing math is precision-sensitive (the reference is full
# fp32 CUDA): TPU's default bf16 matmul passes visibly corrupt covariance and
# distance computations.  Hot paths that tolerate lower precision opt back
# down explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

# This machine's remote-TPU service can wedge indefinitely when serving
# Mosaic (Pallas) programs through its compilation cache (reproducible:
# identical kernels hang with the cache enabled, run in <1s with it
# disabled).  Caching is disabled defensively; set MOM_TPU_COMPCACHE=1 to
# re-enable on healthy installations.
import os as _os
if _os.environ.get("MOM_TPU_COMPCACHE") != "1":
    try:
        _jax.config.update("jax_enable_compilation_cache", False)
    except Exception:
        pass
