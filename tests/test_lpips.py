"""LPIPS-alex parity vs a torch replica of the lpips package's forward
(the reference imports the package at utils/loss_utils.py:16; its live call
is dormant — lambda_lpips=0 — but the port must match the math)."""

import pytest

pytestmark = pytest.mark.parity
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mom_tpu.train import lpips as LP


def _torch_lpips(params, img0, img1):
    """lpips.LPIPS(net='alex') forward rebuilt with torch ops from our
    converted parameter trees."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        taps = []
        strides = [4, 1, 1, 1, 1]
        pads = [2, 2, 1, 1, 1]
        for i, conv in enumerate(params["conv"]):
            w = torch.tensor(np.asarray(conv["w"])).permute(3, 2, 0, 1)
            b = torch.tensor(np.asarray(conv["b"]))
            x = F.relu(F.conv2d(x, w, b, stride=strides[i], padding=pads[i]))
            taps.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, 2)
        return taps

    t0 = feats(torch.tensor(img0).permute(0, 3, 1, 2) * 2 - 1)
    t1 = feats(torch.tensor(img1).permute(0, 3, 1, 2) * 2 - 1)
    total = 0.0
    for a, b, lin in zip(t0, t1, params["lin"]):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        w = torch.tensor(np.asarray(lin)).view(1, -1, 1, 1)
        total = total + (d * w).sum(1).mean(dim=(1, 2))
    return float(total.mean())


def test_lpips_matches_torch_replica():
    params = LP.init_lpips(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    img0 = rng.rand(2, 64, 64, 3).astype(np.float32)
    img1 = np.clip(img0 + 0.1 * rng.randn(2, 64, 64, 3).astype(np.float32),
                   0, 1)
    ours = float(LP.lpips_distance(params, jnp.asarray(img0),
                                   jnp.asarray(img1)))
    ref = _torch_lpips(params, img0, img1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_lpips_state_dict_round_trip():
    """from_torch_state consumes the lpips package's key layout."""
    params = LP.init_lpips(jax.random.PRNGKey(2))
    conv_keys = ["net.slice1.0", "net.slice2.3", "net.slice3.6",
                 "net.slice4.8", "net.slice5.10"]
    sd = {}
    for ck, conv in zip(conv_keys, params["conv"]):
        sd[f"{ck}.weight"] = torch.tensor(
            np.asarray(conv["w"])).permute(3, 2, 0, 1)
        sd[f"{ck}.bias"] = torch.tensor(np.asarray(conv["b"]))
    for i, lin in enumerate(params["lin"]):
        sd[f"lin{i}.model.1.weight"] = torch.tensor(
            np.asarray(lin)).view(1, -1, 1, 1)
    back = LP.from_torch_state(sd)
    for a, b in zip(params["conv"], back["conv"]):
        np.testing.assert_allclose(np.asarray(a["w"]), np.asarray(b["w"]))
    for a, b in zip(params["lin"], back["lin"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_lpips_basic_properties():
    params = LP.init_lpips(jax.random.PRNGKey(3))
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    other = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    assert float(LP.lpips_distance(params, img, img)) == 0.0
    assert float(LP.lpips_distance(params, img, other)) > 0.0
    # differentiable + jittable
    g = jax.jit(jax.grad(lambda x: LP.lpips_distance(params, x, other)))(img)
    assert np.isfinite(np.asarray(g)).all()
