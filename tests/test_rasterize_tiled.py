"""Parity tests: Pallas tile-binned rasterizer (interpret mode on CPU) vs the
pure-JAX oracle — forward images and full VJP."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from mom_tpu.ops.rasterize_ref import rasterize_reference
from mom_tpu.ops.rasterize import (rasterize_tiled, bin_gaussians,
                                    default_key_cap, CHUNK)
from mom_tpu.ops.preprocess import preprocess
from tests.test_rasterize_ref import make_scene, make_camera


def _args(cam, params, **kw):
    means, scales, q, opac, shs = params
    return dict(means3d=means, scales=scales, rotations=q, opacities=opac,
                shs=shs, viewmatrix=jnp.asarray(cam.world_view),
                projmatrix=jnp.asarray(cam.full_proj),
                campos=jnp.asarray(cam.camera_center),
                tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
                width=cam.width, height=cam.height, **kw)


def test_binning_covers_all_instances():
    cam, params = make_scene(n=40, width=48, height=32)
    kwargs = _args(cam, params, bg=jnp.zeros(3))
    pre = preprocess(kwargs["means3d"], kwargs["scales"], kwargs["rotations"],
                     kwargs["opacities"], kwargs["shs"], kwargs["viewmatrix"],
                     kwargs["projmatrix"], kwargs["campos"],
                     kwargs["tanfovx"], kwargs["tanfovy"], 48, 32)
    b = bin_gaussians(pre, 48, 32, key_cap=default_key_cap(40, 32.0))
    assert int(b.overflow) == 0
    starts, ends = np.asarray(b.tile_starts), np.asarray(b.tile_ends)
    assert starts[0] == 0
    assert np.all(ends >= starts)
    # CHUNK-aligned padded segments
    from mom_tpu.ops.rasterize import CHUNK
    assert np.all(starts % CHUNK == 0)
    next_start = np.concatenate([starts[1:], [np.asarray(b.slot_valid).size]])
    assert np.all(ends <= next_start)
    # every real instance appears exactly once
    assert int(np.asarray(b.slot_valid).sum()) == int(b.num_keys)
    assert (ends - starts).sum() == int(b.num_keys)


def test_tiled_matches_oracle_forward():
    cam, params = make_scene(n=120, width=48, height=32, seed=3)
    bg = jnp.array([0.2, 0.3, 0.4])
    ref = rasterize_reference(**_args(cam, params, bg=bg))
    til = rasterize_tiled(**_args(cam, params, bg=bg))
    assert int(til.overflow) == 0
    np.testing.assert_allclose(np.asarray(til.color), np.asarray(ref.color),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(til.depth), np.asarray(ref.depth),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(til.final_T), np.asarray(ref.final_T),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(til.radii), np.asarray(ref.radii))


@pytest.mark.parity
def test_tiled_matches_oracle_gradients():
    cam, params = make_scene(n=60, width=32, height=32, seed=7)
    bg = jnp.array([0.1, 0.1, 0.1])
    target = jnp.zeros((32, 32, 3)) + 0.5

    def loss_fn(raster):
        def loss(means, scales, q, opac, shs):
            out = raster(**_args(cam, (means, scales, q, opac, shs), bg=bg))
            return (jnp.abs(out.color - target).mean()
                    + 0.01 * out.depth.mean() + 0.001 * out.final_T.mean())
        return loss

    g_ref = jax.grad(loss_fn(rasterize_reference), argnums=(0, 1, 2, 3, 4))(*params)
    g_til = jax.grad(loss_fn(rasterize_tiled), argnums=(0, 1, 2, 3, 4))(*params)
    names = ["means", "scales", "quats", "opacity", "shs"]
    for name, gr, gt in zip(names, g_ref, g_til):
        gr, gt = np.asarray(gr), np.asarray(gt)
        assert np.all(np.isfinite(gt)), name
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gt, gr, atol=3e-4 * scale + 1e-8,
                                   err_msg=name)


@pytest.mark.parity
def test_tiled_means2d_offset_gradient_matches():
    cam, params = make_scene(n=30, width=32, height=16, seed=11)
    bg = jnp.zeros(3)
    off = jnp.zeros((30, 2))

    def loss(raster, o):
        out = raster(**_args(cam, params, bg=bg, means2d_offset=o))
        return jnp.sum((out.color - 0.25) ** 2)

    g_ref = jax.grad(lambda o: loss(rasterize_reference, o))(off)
    g_til = jax.grad(lambda o: loss(rasterize_tiled, o))(off)
    scale = np.abs(np.asarray(g_ref)).max() + 1e-8
    np.testing.assert_allclose(np.asarray(g_til), np.asarray(g_ref),
                               atol=3e-4 * scale)


def test_key_cap_overflow_reported():
    cam, params = make_scene(n=120, width=48, height=32, seed=3)
    out = rasterize_tiled(**_args(cam, params, bg=jnp.zeros(3)), key_cap=max(128, CHUNK))
    assert int(out.overflow) > 0


def test_overflow_drops_farthest_first():
    """Under key_cap overflow the NEAREST gaussians' instances must survive
    (depth-ranked expansion): a saturated near gaussian must still paint its
    pixels even when far gaussians overflow the buffer.  This is the fix for
    the fine-stage opacity-reset blowup (VERDICT r2, weak #3): post-reset
    floods drop only instances the T<1e-4 early-exit would have ignored."""
    cam = make_camera(width=32, height=32)
    # far gaussians covering the whole image + 1 near opaque red one
    # (enough that their ~4 instances each overflow even a CHUNK=256 cap)
    rng = np.random.RandomState(7)
    n_far = 80
    means = np.concatenate([
        np.array([[0.0, 0.0, 2.0]], np.float32),                   # near
        np.stack([rng.uniform(-1, 1, n_far), rng.uniform(-1, 1, n_far),
                  np.full(n_far, 8.0)], -1).astype(np.float32)])   # far
    scales = np.concatenate([
        np.full((1, 3), np.log(0.15), np.float32),
        np.full((n_far, 3), np.log(2.0), np.float32)])             # huge rects
    q = np.zeros((n_far + 1, 4), np.float32); q[:, 0] = 1.0
    opac = np.full((n_far + 1, 1), 10.0, np.float32)               # ~opaque
    from mom_tpu.utils.sh import rgb2sh
    cols = np.zeros((n_far + 1, 3), np.float32)
    cols[0, 0] = 1.0                                               # red near
    shs = np.zeros((n_far + 1, 16, 3), np.float32)
    shs[:, 0, :] = np.asarray(rgb2sh(cols))
    params = tuple(jnp.asarray(a) for a in (means, scales, q, opac, shs))
    # tight cap: the near gaussian's instances fit, most far ones overflow
    out = rasterize_tiled(**_args(cam, params, bg=jnp.zeros(3)), key_cap=max(128, CHUNK))
    assert int(out.overflow) > 0
    # center pixel shows the near red gaussian, not background/far color
    c = np.asarray(out.color)[16, 16]
    assert c[0] > 0.8, c
    assert c[1] < 0.2 and c[2] < 0.2, c


@pytest.mark.parity
def test_overflow_gradients_stay_finite():
    """Regression: key_cap overflow must not NaN gradients (the pack VJP's
    out-of-bounds segment bounds used to hit jnp.take's NaN fill mode)."""
    cam, params = make_scene(n=120, width=48, height=32, seed=3)

    def loss(*p):
        out = rasterize_tiled(**_args(cam, p, bg=jnp.zeros(3)), key_cap=max(256, CHUNK))
        return jnp.abs(out.color - 0.5).mean()

    out = rasterize_tiled(**_args(cam, params, bg=jnp.zeros(3)), key_cap=max(256, CHUNK))
    assert int(out.overflow) > 0
    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*params)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parity
def test_row_band_rendering_matches_full():
    """row_tiles sharding: stitching per-band renders == the full render
    (the image-sharded path of point-sharded multi-chip rendering)."""
    cam, params = make_scene(n=300, width=64, height=64, seed=5)
    bg = jnp.array([0.1, 0.2, 0.3])
    kwargs = _args(cam, params, bg=bg, key_cap=4096)
    full = rasterize_tiled(**kwargs)
    bands = []
    for ty0, ty1 in ((0, 2), (2, 4)):
        out = rasterize_tiled(**kwargs, row_tiles=(ty0, ty1))
        assert out.color.shape == (32, 64, 3)
        bands.append(np.asarray(out.color))
    stitched = np.concatenate(bands, axis=0)
    np.testing.assert_allclose(stitched, np.asarray(full.color), atol=1e-5)

    # gradients through a band == the same-rows slice of the full gradient
    means, scales, q, opac, shs = params

    def loss_full(op):
        kw = _args(cam, (means, scales, q, op, shs), bg=bg, key_cap=4096)
        return jnp.sum(rasterize_tiled(**kw).color[:32])

    def loss_band(op):
        kw = _args(cam, (means, scales, q, op, shs), bg=bg, key_cap=4096,
                   row_tiles=(0, 2))
        return jnp.sum(rasterize_tiled(**kw).color)

    g_full = np.asarray(jax.grad(loss_full)(opac))
    g_band = np.asarray(jax.grad(loss_band)(opac))
    # segment-sum accumulation order differs (full reduces both bands'
    # instance grads in global depth order; the off-band ones are exact
    # zeros only in real math) — pure fp32 reordering noise
    np.testing.assert_allclose(g_band, g_full, atol=3e-4)


@pytest.mark.parity
def test_radix_binning_matches_sort_binning(monkeypatch):
    """MOM_TPU_BIN_RADIX=1 (MXU counting sort over tx/ty digits) must
    produce the exact same Binning as the lax.sort path, including pads
    and key_cap overflow."""
    import os
    from mom_tpu.ops.rasterize import bin_gaussians
    for n, cap in ((120, 4096), (120, 512)):        # no-overflow + overflow
        cam, params = make_scene(n=n, width=48, height=32, seed=3)
        kwargs = _args(cam, params, bg=jnp.zeros(3))
        pre = preprocess(
            kwargs["means3d"], kwargs["scales"], kwargs["rotations"],
            kwargs["opacities"], kwargs["shs"], kwargs["viewmatrix"],
            kwargs["projmatrix"], kwargs["campos"], kwargs["tanfovx"],
            kwargs["tanfovy"], 48, 32)
        monkeypatch.delenv("MOM_TPU_BIN_RADIX", raising=False)
        a = bin_gaussians(pre, 48, 32, key_cap=cap)
        monkeypatch.setenv("MOM_TPU_BIN_RADIX", "1")
        b = bin_gaussians(pre, 48, 32, key_cap=cap)
        monkeypatch.delenv("MOM_TPU_BIN_RADIX", raising=False)
        for name in a._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
                err_msg=f"{name} cap={cap}")


@pytest.mark.parity
def test_counting_binning_matches_sort_binning(monkeypatch):
    """MOM_TPU_BIN_V2=1 (Pallas counting layout: per-block histograms +
    within-block rank + direct scatter) must produce the same Binning as
    the lax.sort path on every field that consumers read unmasked —
    gid_sorted is compared on valid slots only (pad slots carry don't-care
    values that every kernel gates by slot_valid / lane count)."""
    from mom_tpu.ops.rasterize import bin_gaussians
    for n, cap, seed in ((120, 4096, 3), (120, max(512, CHUNK * 2), 3),
                         (120, max(128, CHUNK), 7), (40, 1024, 11)):
        cam, params = make_scene(n=n, width=48, height=32, seed=seed)
        kwargs = _args(cam, params, bg=jnp.zeros(3))
        pre = preprocess(
            kwargs["means3d"], kwargs["scales"], kwargs["rotations"],
            kwargs["opacities"], kwargs["shs"], kwargs["viewmatrix"],
            kwargs["projmatrix"], kwargs["campos"], kwargs["tanfovx"],
            kwargs["tanfovy"], 48, 32)
        monkeypatch.delenv("MOM_TPU_BIN_V2", raising=False)
        a = bin_gaussians(pre, 48, 32, key_cap=cap)
        monkeypatch.setenv("MOM_TPU_BIN_V2", "1")
        b = bin_gaussians(pre, 48, 32, key_cap=cap)
        monkeypatch.delenv("MOM_TPU_BIN_V2", raising=False)
        valid = np.asarray(a.slot_valid)
        for name in a._fields:
            av = np.asarray(getattr(a, name))
            bv = np.asarray(getattr(b, name))
            if name == "gid_sorted":
                av, bv = av[valid], bv[valid]
            np.testing.assert_array_equal(
                av, bv, err_msg=f"{name} n={n} cap={cap}")


@pytest.mark.parity
def test_counting_binning_forward_and_grads_match(monkeypatch):
    """End-to-end render under MOM_TPU_BIN_V2=1 matches the default path
    bit-for-bit (same instances, same order), forward and gradients."""
    cam, params = make_scene(n=120, width=48, height=32, seed=5)
    bg = jnp.array([0.1, 0.2, 0.3])
    means, scales, q, opac, shs = params

    def color_and_grad():
        def loss(op):
            kw = _args(cam, (means, scales, q, op, shs), bg=bg, key_cap=4096)
            return jnp.sum(rasterize_tiled(**kw).color[:16] ** 2)
        kw = _args(cam, params, bg=bg, key_cap=4096)
        return (np.asarray(rasterize_tiled(**kw).color),
                np.asarray(jax.grad(loss)(opac)))

    monkeypatch.delenv("MOM_TPU_BIN_V2", raising=False)
    c_ref, g_ref = color_and_grad()
    monkeypatch.setenv("MOM_TPU_BIN_V2", "1")
    c_v2, g_v2 = color_and_grad()
    monkeypatch.delenv("MOM_TPU_BIN_V2", raising=False)
    np.testing.assert_array_equal(c_v2, c_ref)
    np.testing.assert_array_equal(g_v2, g_ref)


@pytest.mark.parity
def test_mxu_split_cumsum_parity(monkeypatch):
    """MOM_TPU_MXU_SPLIT=k runs the compositing transmittance cumsum as k
    bf16 MXU passes; k=3 must match the fp32 path to ~1e-5 (forward AND
    gradients), k=2 to ~1e-3."""
    cam, params = make_scene(n=120, width=48, height=32, seed=5)
    bg = jnp.array([0.1, 0.2, 0.3])
    means, scales, q, opac, shs = params

    def color_and_grad():
        def loss(op):
            kw = _args(cam, (means, scales, q, op, shs), bg=bg, key_cap=4096)
            return jnp.sum(rasterize_tiled(**kw).color[:16] ** 2)
        kw = _args(cam, params, bg=bg, key_cap=4096)
        return (np.asarray(rasterize_tiled(**kw).color),
                np.asarray(jax.grad(loss)(opac)))

    monkeypatch.delenv("MOM_TPU_MXU_SPLIT", raising=False)
    c_ref, g_ref = color_and_grad()
    for k, atol_c, atol_g in ((3, 2e-5, 2e-4), (2, 2e-3, 2e-2)):
        monkeypatch.setenv("MOM_TPU_MXU_SPLIT", str(k))
        c_k, g_k = color_and_grad()
        np.testing.assert_allclose(c_k, c_ref, atol=atol_c,
                                   err_msg=f"color split={k}")
        np.testing.assert_allclose(g_k, g_ref, atol=atol_g,
                                   err_msg=f"grad split={k}")
    monkeypatch.delenv("MOM_TPU_MXU_SPLIT", raising=False)


@pytest.mark.parity
def test_chunk_256_parity():
    """MOM_TPU_CHUNK=256 (half the grid steps, double cumsum FLOPs) must
    match the oracle exactly like the default 128 path.  CHUNK is read at
    module import, so this runs in a subprocess."""
    import subprocess, sys, os
    code = """
import os
os.environ["MOM_TPU_INTERPRET"] = "1"
os.environ["MOM_TPU_CHUNK"] = "256"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import sys; sys.path.insert(0, %r)
from tests.test_rasterize_ref import make_scene
from mom_tpu.ops.rasterize_ref import rasterize_reference
from mom_tpu.ops.rasterize import rasterize_tiled
from tests.test_rasterize_tiled import _args
cam, params = make_scene(n=120, width=48, height=32, seed=3)
bg = jnp.array([0.2, 0.3, 0.4])
ref = rasterize_reference(**_args(cam, params, bg=bg))
til = rasterize_tiled(**_args(cam, params, bg=bg))
np.testing.assert_allclose(np.asarray(til.color), np.asarray(ref.color),
                           atol=2e-4)
def loss(op):
    means, scales, q, opac, shs = params
    kw = _args(cam, (means, scales, q, op, shs), bg=bg, key_cap=4096)
    return jnp.sum(rasterize_tiled(**kw).color[:16] ** 2)
def loss_ref(op):
    means, scales, q, opac, shs = params
    kw = _args(cam, (means, scales, q, op, shs), bg=bg)
    return jnp.sum(rasterize_reference(**kw).color[:16] ** 2)
np.testing.assert_allclose(np.asarray(jax.grad(loss)(params[3])),
                           np.asarray(jax.grad(loss_ref)(params[3])),
                           atol=3e-4)
print("OK")
"""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code % root], cwd=root,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def test_banded_render_matches_whole_image():
    """A tuple key_cap splits the image into tile-row bands
    (_rasterize_banded); with zero overflow the concatenated bands must be
    BIT-IDENTICAL to the whole-image pass: each tile sees the same
    instances in the same depth order regardless of banding."""
    cam, params = make_scene(n=120, width=48, height=48, seed=11)
    bg = jnp.array([0.2, 0.1, 0.3])
    whole = rasterize_tiled(**_args(cam, params, bg=bg),
                            key_cap=default_key_cap(120, 48.0))
    per_band = default_key_cap(120, 48.0)     # generous: zero overflow
    banded = rasterize_tiled(**_args(cam, params, bg=bg),
                             key_cap=(per_band, per_band, per_band))
    assert int(banded.overflow) == 0 and int(whole.overflow) == 0
    assert int(banded.num_keys) == int(whole.num_keys)
    np.testing.assert_array_equal(np.asarray(banded.color),
                                  np.asarray(whole.color))
    np.testing.assert_array_equal(np.asarray(banded.depth),
                                  np.asarray(whole.depth))
    np.testing.assert_array_equal(np.asarray(banded.final_T),
                                  np.asarray(whole.final_T))


def test_banded_demand_partitions_whole_demand():
    """Per-band demands (render.instance_demand bands>1) must sum exactly
    to the whole-image demand: band demand is the rect rows clamped to the
    band, and the bands partition the tile rows."""
    from mom_tpu.render import instance_demand as _  # noqa: F401  (API)
    from mom_tpu.ops.rasterize import tile_rect, TILE
    cam, params = make_scene(n=200, width=64, height=64, seed=13)
    kwargs = _args(cam, params)
    pre = preprocess(kwargs["means3d"], kwargs["scales"], kwargs["rotations"],
                     kwargs["opacities"], kwargs["shs"], kwargs["viewmatrix"],
                     kwargs["projmatrix"], kwargs["campos"],
                     kwargs["tanfovx"], kwargs["tanfovy"], 64, 64)
    alive = np.asarray(pre.valid & (pre.radii > 0))
    rmn, rmx = tile_rect(pre.means2d, pre.radii, 64, 64)
    rmn, rmx = np.asarray(rmn), np.asarray(rmx)
    rw = rmx[:, 0] - rmn[:, 0]
    whole = int((alive * rw * (rmx[:, 1] - rmn[:, 1])).sum())
    gy = -(-64 // TILE)
    B = 3
    bounds = [round(b * gy / B) for b in range(B + 1)]
    total = 0
    for b in range(B):
        rh = (np.clip(rmx[:, 1], bounds[b], bounds[b + 1])
              - np.clip(rmn[:, 1], bounds[b], bounds[b + 1]))
        total += int((alive * rw * rh).sum())
    assert total == whole
