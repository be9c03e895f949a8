"""SPADE-UNet motion estimator parity vs the vendored reference module
(thirdparty/cinemagraphy/lib/model/motion/architectures.py:612-778) at
random weights, including spectral-norm weight folding and the channel-split
upsampling quirk."""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.parity
import torch

import jax
import jax.numpy as jnp

from mom_tpu.motion import spade as SP


@pytest.fixture(scope="module")
def ref_arch():
    # the vendored package imports torchvision (not installed here) at
    # module level for unrelated perceptual-loss classes — stub it
    if "torchvision" not in sys.modules:
        import importlib.machinery
        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tv.models = types.ModuleType("torchvision.models")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    sys.path.insert(0, "/root/reference")
    try:
        from thirdparty.cinemagraphy.lib.model.motion import architectures
    except Exception as e:              # pragma: no cover
        pytest.skip(f"vendored cinemagraphy not importable: {e}")
    yield architectures
    sys.path.remove("/root/reference")


def test_spade_unet_matches_reference(ref_arch):
    config = {"norm_G": "sync:spectral_batch",
              "motion_norm_G": "sync:spectral_instance"}
    torch.manual_seed(0)
    ref = ref_arch.SPADEUnet4MaskMotion(channels_in=6, channels_out=2,
                                        config=config).eval()
    params = SP.from_torch_state(ref.state_dict())

    rng = np.random.RandomState(1)
    img = (rng.rand(1, 256, 256, 3).astype(np.float32) * 2 - 1)
    mask = (rng.rand(1, 256, 256, 1) > 0.5).astype(np.float32)
    hint = rng.randn(1, 256, 256, 2).astype(np.float32)
    net_in = np.concatenate([img, mask, hint], axis=-1)

    with torch.no_grad():
        ref_out = ref(torch.tensor(net_in).permute(0, 3, 1, 2))
    ours = SP.spade_unet_forward(params, jnp.asarray(net_in))
    # tolerance: 16 conv stages + instance norms accumulate ~1e-3 of float
    # noise on a tiny fraction of pixels (verified 10/131072 above 2e-4)
    np.testing.assert_allclose(np.asarray(ours),
                               ref_out.permute(0, 2, 3, 1).numpy(),
                               atol=2e-3, rtol=1e-3)


def test_forward_flow_div_flow():
    params = SP.init_spade_unet(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(1, 256, 256, 3).astype(np.float32) * 2 - 1)
    mask = jnp.asarray((rng.rand(1, 256, 256, 1) > 0.5).astype(np.float32))
    hint = jnp.asarray(rng.randn(1, 256, 256, 2).astype(np.float32))
    f1 = SP.forward_flow(params, img, mask, hint, div_flow=1.0)
    f20 = SP.forward_flow(params, img, mask, hint, div_flow=20.0)
    np.testing.assert_allclose(np.asarray(f20), 20.0 * np.asarray(f1),
                               rtol=1e-5)
    assert f1.shape == (1, 256, 256, 2)


def test_sceneflow_pth_file_roundtrip(ref_arch, tmp_path):
    """File-level seam: a sceneflow_model.pth written in the released
    nesting ({'netG': state_dict} — cinemagraphy demo.py:191-193) loads
    through FlowEstimator's disk path and converts identically to the
    in-memory converter."""
    config = {"norm_G": "sync:spectral_batch",
              "motion_norm_G": "sync:spectral_instance"}
    torch.manual_seed(3)
    ref = ref_arch.SPADEUnet4MaskMotion(channels_in=6, channels_out=2,
                                        config=config).eval()
    path = tmp_path / "sceneflow_model.pth"
    torch.save({"netG": ref.state_dict(),
                "optimizer": {}, "num_epoch": 100}, path)

    from mom_tpu.motion.flow import FlowEstimator
    est = FlowEstimator(backend="spade", ckpt_path=str(path))
    expect = SP.from_torch_state(ref.state_dict())
    jax.tree.map(np.testing.assert_array_equal, est._spade, expect)
