"""StyleGAN2 generator + fs-encoder parity vs the vendored StyleCineGAN
modules at random weights.

The vendored CUDA ops (fused_bias_act/upfirdn2d) JIT-compile at import, so
the tests stub the op module with the reference's own ``upfirdn2d_native``
(exec'd from the vendored source) + the textbook fused leaky relu, then
import the vendored Generator against those.
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.parity
import torch
import torch.nn as nn
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from mom_tpu.motion.stylegan import (GeneratorConfig, init_generator,
                                     style_forward, synthesize,
                                     warp_blend_feature, convert,
                                     init_fs_encoder, fs_encode)
from mom_tpu.motion.stylegan import ops as JOPS

REF = "/root/reference/thirdparty/StyleCineGAN"


def _load_upfirdn_native():
    src = open(f"{REF}/models/stylegan2/op/upfirdn2d.py").read()
    start = src.index("def upfirdn2d_native")
    body = src[start:]
    ns = {"torch": torch, "F": TF}
    exec(body, ns)
    return ns["upfirdn2d_native"]


@pytest.fixture(scope="module")
def ref_generator_module():
    upfirdn_native = _load_upfirdn_native()

    def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
        # the CUDA wrapper feeds the native path (-1, H, W, 1) minor-layout
        # views (op/upfirdn2d.py UpFirDn2d.forward)
        b, c, h, w = x.shape
        out = upfirdn_native(x.reshape(-1, h, w, 1), kernel, up, up,
                             down, down, pad[0], pad[1], pad[0], pad[1])
        # native returns (-1, out_h, out_w, minor)
        return out.reshape(b, c, out.shape[1], out.shape[2])

    def fused_leaky_relu(x, bias=None, negative_slope=0.2,
                         scale=2 ** 0.5):
        if bias is not None:
            shape = [1, -1] + [1] * (x.ndim - 2)
            x = x + bias.view(*shape)
        return TF.leaky_relu(x, negative_slope) * scale

    class FusedLeakyReLU(nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
            super().__init__()
            self.bias = nn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, x):
            return fused_leaky_relu(x, self.bias, self.negative_slope,
                                    self.scale)

    op_mod = types.ModuleType("thirdparty.StyleCineGAN.models.stylegan2.op")
    op_mod.upfirdn2d = upfirdn2d
    op_mod.fused_leaky_relu = fused_leaky_relu
    op_mod.FusedLeakyReLU = FusedLeakyReLU
    sys.modules["thirdparty.StyleCineGAN.models.stylegan2.op"] = op_mod

    # warp stub: deterministic roll, swapped in for parity of the
    # warp_blend_feature CONTROL FLOW (the real warp chain is tested
    # separately below)
    cu = types.ModuleType("thirdparty.StyleCineGAN.utils.cinemagraph_utils")
    cu.warp_one_level = lambda out, flow, idx, n: torch.roll(
        out, shifts=(1, 2), dims=(2, 3))
    sys.modules["thirdparty.StyleCineGAN.utils.cinemagraph_utils"] = cu

    sys.path.insert(0, "/root/reference")
    import importlib
    mod = importlib.import_module(
        "thirdparty.StyleCineGAN.models.stylegan2.model")
    yield mod
    sys.path.remove("/root/reference")


CFG = GeneratorConfig(size=64, style_dim=64, n_mlp=2, channel_multiplier=1)


def _small_ref_gen(mod):
    torch.manual_seed(0)
    g = mod.Generator(CFG.size, CFG.style_dim, CFG.n_mlp,
                      channel_multiplier=CFG.channel_multiplier).eval()
    with torch.no_grad():
        for p in g.parameters():
            if (p == 0).all():
                p.add_(0.05 * torch.randn_like(p))
    return g


def test_style_and_synthesis_match(ref_generator_module):
    mod = ref_generator_module
    g = _small_ref_gen(mod)
    params = convert.from_g_ema(g.state_dict(), CFG)

    rng = np.random.RandomState(1)
    z = rng.randn(1, CFG.style_dim).astype(np.float32)
    with torch.no_grad():
        w_ref = g.style(torch.tensor(z)).numpy()
    w_ours = np.asarray(style_forward(params, jnp.asarray(z)))
    np.testing.assert_allclose(w_ours, w_ref, atol=1e-4, rtol=1e-3)

    noise = [getattr(g.noises, f"noise_{i}") for i in range(g.num_layers)]
    with torch.no_grad():
        img_ref, _ = g([torch.tensor(w_ref)], input_is_latent=True,
                       noise=noise)
    img_ours, _ = synthesize(params, CFG, jnp.asarray(w_ref[0]))
    np.testing.assert_allclose(
        np.asarray(img_ours), img_ref.permute(0, 2, 3, 1).numpy(),
        atol=2e-3, rtol=1e-2)


def test_warp_blend_feature_matches(ref_generator_module):
    mod = ref_generator_module
    g = _small_ref_gen(mod)
    params = convert.from_g_ema(g.state_dict(), CFG)

    rng = np.random.RandomState(2)
    latent = rng.randn(1, CFG.n_latent, CFG.style_dim).astype(np.float32)
    # feature injected at recon level 3: the conv there upsamples 8 -> 16,
    # so the injected map lives at 8^2 with channels[8]=512
    feature = rng.randn(1, 512, 8, 8).astype(np.float32)

    # the torch side's warp_one_level was stubbed to roll (1, 2) at import;
    # warp_blend_feature builds an (unused) blur kernel with .cuda()
    # (model.py:640) — neutralize on this CPU-only machine
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        with torch.no_grad():
            img_ref, _ = g.warp_blend_feature(
                styles=[torch.tensor(latent)],
                feature=torch.tensor(feature),
                idx=3, n_frames=10, flow=None, recon_feature_idx=3,
                warp_feature_idx=3, input_is_latent=True,
                randomize_noise=False)
    finally:
        torch.Tensor.cuda = orig_cuda

    def warp_fn(x):                      # same roll, NHWC axes
        return jnp.roll(x, shift=(1, 2), axis=(1, 2))

    img_ours = warp_blend_feature(
        params, CFG, jnp.asarray(latent),
        jnp.asarray(feature.transpose(0, 2, 3, 1)), warp_fn,
        recon_feature_idx=3, warp_feature_idx=3)
    np.testing.assert_allclose(
        np.asarray(img_ours), img_ref.permute(0, 2, 3, 1).numpy(),
        atol=2e-3, rtol=1e-2)


def test_upfirdn2d_matches_reference_native():
    upfirdn_native = _load_upfirdn_native()
    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 9, 11).astype(np.float32)
    k = JOPS.make_kernel([1, 3, 3, 1])
    for up, down, pad in [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (2, 2)),
                          (2, 2, (3, 0))]:
        ref = upfirdn_native(
            torch.tensor(x).reshape(-1, 9, 11, 1), torch.tensor(k), up, up,
            down, down, pad[0], pad[1], pad[0], pad[1])
        ref = ref.reshape(2, 3, ref.shape[1], ref.shape[2])
        ours = JOPS.upfirdn2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                              jnp.asarray(k), up=up, down=down, pad=pad)
        np.testing.assert_allclose(np.asarray(ours),
                                   ref.permute(0, 2, 3, 1).numpy(),
                                   atol=1e-5)


# ---------------------------------------------------------------------------
# warp chain parity (euler integration + linear joint splat + inpaint)

@pytest.fixture(scope="module")
def ref_cinemagraph_euler():
    """exec the vendored euler_integration with the cuda calls neutralized
    (pure indexing code otherwise)."""
    src = open(f"{REF}/utils/cinemagraph_utils.py").read()
    start = src.index("def euler_integration")
    end = src.index("def pad_tensor")
    body = src[start:end].replace("device='cuda'", "device='cpu'")
    body = body.replace(".cuda()", "")
    ns = {"torch": torch, "np": np}
    exec(body, ns)
    return ns["euler_integration"]


def test_euler_integration_nearest_matches(ref_cinemagraph_euler):
    from mom_tpu.motion.stylegan.warp import euler_integrate_nearest
    rng = np.random.RandomState(4)
    motion = rng.randn(1, 2, 12, 14).astype(np.float32) * 1.5
    for steps in (0, 1, 4, 9):
        ref, _ = ref_cinemagraph_euler(torch.tensor(motion), steps)
        ours = euler_integrate_nearest(
            jnp.asarray(motion[0].transpose(1, 2, 0)), steps)
        np.testing.assert_allclose(np.asarray(ours),
                                   ref[0].permute(1, 2, 0).numpy(),
                                   atol=1e-4)


def test_warp_one_level_runs():
    from mom_tpu.motion.stylegan.warp import warp_one_level
    rng = np.random.RandomState(5)
    feat = jnp.asarray(rng.randn(1, 64, 64, 8).astype(np.float32))
    flow = jnp.asarray(rng.randn(1, 64, 64, 2).astype(np.float32))
    out = warp_one_level(feat, flow, 3, 10)
    assert out.shape == feat.shape
    assert np.isfinite(np.asarray(out)).all()
    # identity at idx 0 with zero flow
    out0 = warp_one_level(feat, jnp.zeros_like(flow), 0, 10)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(feat), atol=1e-4)


# ---------------------------------------------------------------------------
# fs encoder parity

@pytest.fixture(scope="module")
def ref_fs_encoder(tmp_path_factory):
    fs_dir = f"{REF}/external_modules/feature_style_encoder"
    sys.path.insert(0, fs_dir)
    if "torchvision" not in sys.modules:
        import importlib.machinery
        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tv.models = types.ModuleType("torchvision.models")
        tv.utils = types.ModuleType("torchvision.utils")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
        sys.modules["torchvision.utils"] = tv.utils
    try:
        from arcface.iresnet import iresnet50
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "fs_nets", f"{fs_dir}/nets/feature_style_encoder.py")
        nets = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(nets)
    except Exception as e:              # pragma: no cover
        sys.path.remove(fs_dir)
        pytest.skip(f"vendored fs encoder not importable: {e}")
    # fs_encoder_v2 loads the arcface checkpoint at init — feed it a random
    # state dict written to disk
    torch.manual_seed(6)
    tmp = tmp_path_factory.mktemp("arcface")
    resnet = iresnet50()
    torch.save(resnet.state_dict(), tmp / "backbone.pth")

    from argparse import Namespace
    opts = Namespace(arcface_model_path=str(tmp / "backbone.pth"), idx_k=9)
    enc = nets.fs_encoder_v2(n_styles=18, opts=opts, stride=(2, 2)).eval()
    yield enc
    sys.path.remove(fs_dir)


def test_fs_encoder_matches(ref_fs_encoder):
    enc = ref_fs_encoder
    params = convert.from_fs_encoder(enc.state_dict())
    rng = np.random.RandomState(7)
    x = rng.randn(1, 3, 256, 256).astype(np.float32)
    with torch.no_grad():
        lat_ref, content_ref = enc(torch.tensor(x))
    lat, content = fs_encode(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(lat), lat_ref.numpy(),
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(content),
                               content_ref.permute(0, 2, 3, 1).numpy(),
                               atol=2e-3, rtol=1e-2)


def test_sg2_ckpt_file_roundtrip(ref_generator_module, tmp_path):
    """File-level seam: a StyleGAN2 checkpoint written in the released
    nesting ({'g_ema': sd, 'latent_avg': ...} — utils/model_utils.py:21-24)
    loads via load_g_ema identically to the in-memory converter."""
    g = _small_ref_gen(ref_generator_module)
    path = tmp_path / "sg2-lhq-1024.pt"
    torch.save({"g_ema": g.state_dict(),
                "latent_avg": torch.zeros(CFG.style_dim)}, path)
    got = convert.load_g_ema(str(path), CFG)
    expect = convert.from_g_ema(g.state_dict(), CFG)
    jax.tree.map(np.testing.assert_array_equal, got, expect)


def test_fs_encoder_ckpt_file_roundtrip(ref_fs_encoder, tmp_path):
    """File-level seam: an encoder checkpoint in the released nesting
    ({'enc_state_dict': sd, ...} — feature_style_encoder/trainer.py:336)
    loads via load_fs_encoder_ckpt identically to the in-memory path."""
    enc = ref_fs_encoder
    path = tmp_path / "checkpoint.pth"
    torch.save({"enc_state_dict": enc.state_dict(),
                "enc_opt_state_dict": {}, "iteration": 100000}, path)
    got = convert.load_fs_encoder_ckpt(str(path))
    expect = convert.from_fs_encoder(enc.state_dict())
    jax.tree.map(np.testing.assert_array_equal, got, expect)
