"""Analytic and gradient tests for the pure-JAX oracle rasterizer."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from mom_tpu.cameras import Camera
from mom_tpu.ops import preprocess as pp
from mom_tpu.ops.rasterize_ref import rasterize_reference
from mom_tpu.utils.sh import rgb2sh


def make_camera(width=32, height=32, fov=0.8):
    return Camera(R=np.eye(3), T=np.zeros(3), fovx=fov, fovy=fov,
                  width=width, height=height)


def make_scene(n=50, seed=0, width=32, height=32):
    rng = np.random.RandomState(seed)
    cam = make_camera(width, height)
    means = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                      rng.uniform(3, 8, n)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-3.0, -1.0, (n, 3))).astype(np.float32)
    q = rng.randn(n, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rgb2sh(rng.uniform(0, 1, (n, 3)))
    shs[:, 1:] = 0.01 * rng.randn(n, 15, 3)
    return cam, (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                 jnp.asarray(opac), jnp.asarray(shs))


def render(cam, params, bg=(0., 0., 0.), **kw):
    means, scales, q, opac, shs = params
    return rasterize_reference(
        means, scales, q, opac, shs,
        jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
        jnp.asarray(cam.camera_center), cam.tanfovx, cam.tanfovy,
        cam.width, cam.height, jnp.asarray(bg), **kw)


def test_empty_scene_is_background():
    cam = make_camera()
    # one gaussian behind the camera -> culled
    means = jnp.array([[0.0, 0.0, -5.0]])
    scales = jnp.full((1, 3), 0.1)
    q = jnp.array([[1.0, 0, 0, 0]])
    opac = jnp.array([0.9])
    shs = jnp.zeros((1, 16, 3))
    out = render(cam, (means, scales, q, opac, shs), bg=(0.25, 0.5, 0.75))
    assert np.allclose(out.color[..., 0], 0.25, atol=1e-6)
    assert np.allclose(out.color[..., 2], 0.75, atol=1e-6)
    assert np.allclose(out.final_T, 1.0)
    assert float(out.radii[0]) == 0.0


def test_single_gaussian_center_alpha():
    """A gaussian on the optical axis: center pixel alpha must equal its
    opacity (power=0 at the projected mean, up to subpixel offset)."""
    cam = make_camera(33, 33)  # odd size -> mean lands exactly on pixel 16
    means = jnp.array([[0.0, 0.0, 5.0]])
    scales = jnp.full((1, 3), 0.3)
    q = jnp.array([[1.0, 0, 0, 0]])
    opac = jnp.array([0.7])
    white = jnp.zeros((1, 16, 3)).at[:, 0].set(rgb2sh(jnp.ones((1, 3))))
    out = render(cam, (means, scales, q, opac, white))
    # projected center: ndc 0 -> pixel ((0+1)*33-1)/2 = 16
    center = np.asarray(out.color)[16, 16]
    assert abs(center[0] - 0.7) < 1e-3, center
    # transmittance at center = 1 - alpha
    assert abs(float(out.final_T[16, 16]) - 0.3) < 1e-3


def test_front_to_back_ordering():
    """A nearer opaque gaussian must dominate over a farther one."""
    cam = make_camera(33, 33)
    means = jnp.array([[0.0, 0.0, 4.0], [0.0, 0.0, 8.0]])
    scales = jnp.full((2, 3), 0.3)
    q = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    opac = jnp.array([0.9, 0.9])
    shs = jnp.zeros((2, 16, 3))
    shs = shs.at[0, 0].set(rgb2sh(jnp.array([1.0, 0.0, 0.0])))   # near: red
    shs = shs.at[1, 0].set(rgb2sh(jnp.array([0.0, 1.0, 0.0])))   # far: green
    out = render(cam, (means, scales, q, opac, shs))
    c = np.asarray(out.color)[16, 16]
    assert c[0] > 0.85 and c[1] < 0.1, c
    # swap declaration order — result must be identical (depth sort)
    out2 = render(cam, (means[::-1], scales, q, opac, shs[::-1]))
    np.testing.assert_allclose(np.asarray(out2.color), np.asarray(out.color),
                               atol=1e-6)


def test_alpha_blending_math():
    """Two overlapping gaussians: C = a1 c1 + (1-a1) a2 c2 at the center."""
    cam = make_camera(33, 33)
    means = jnp.array([[0.0, 0.0, 4.0], [0.0, 0.0, 8.0]])
    scales = jnp.stack([jnp.full(3, 0.24), jnp.full(3, 0.48)])  # same angular size
    q = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    opac = jnp.array([0.4, 0.6])
    shs = jnp.zeros((2, 16, 3))
    shs = shs.at[0, 0].set(rgb2sh(jnp.array([1.0, 0.0, 0.0])))
    shs = shs.at[1, 0].set(rgb2sh(jnp.array([0.0, 1.0, 0.0])))
    out = render(cam, (means, scales, q, opac, shs))
    c = np.asarray(out.color)[16, 16]
    assert abs(c[0] - 0.4) < 2e-3
    assert abs(c[1] - 0.6 * 0.6) < 2e-3
    assert abs(float(out.final_T[16, 16]) - 0.6 * 0.4) < 2e-3


def test_depth_output():
    cam = make_camera(33, 33)
    means = jnp.array([[0.0, 0.0, 5.0]])
    scales = jnp.full((1, 3), 0.3)
    q = jnp.array([[1.0, 0, 0, 0]])
    opac = jnp.array([0.8])
    shs = jnp.zeros((1, 16, 3))
    out = render(cam, (means, scales, q, opac, shs))
    # depth = alpha * z at center
    assert abs(float(out.depth[16, 16]) - 0.8 * 5.0) < 5e-3


@pytest.mark.parity
def test_gradients_flow_and_match_fd():
    cam, params32 = make_scene(n=12, width=16, height=16)

    jax.config.update("jax_enable_x64", True)
    try:
        params = tuple(jnp.asarray(np.asarray(p), jnp.float64) for p in params32)
        vm = jnp.asarray(cam.world_view, jnp.float64)
        fp = jnp.asarray(cam.full_proj, jnp.float64)
        cc = jnp.asarray(cam.camera_center, jnp.float64)

        def loss(means, scales, q, opac, shs):
            out = rasterize_reference(means, scales, q, opac, shs, vm, fp, cc,
                                      cam.tanfovx, cam.tanfovy,
                                      cam.width, cam.height, jnp.zeros(3))
            return jnp.sum(out.color ** 2) + 0.1 * jnp.sum(out.depth ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*params)
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(grads[0]).sum()) > 0  # means get gradient

        # finite-difference check on opacity of a few gaussians
        for i in (0, 3, 7):
            eps = 1e-6
            opac = params[3]
            lp = float(loss(params[0], params[1], params[2],
                            opac.at[i].add(eps), params[4]))
            lm = float(loss(params[0], params[1], params[2],
                            opac.at[i].add(-eps), params[4]))
            fd = (lp - lm) / (2 * eps)
            an = float(grads[3][i])
            assert abs(fd - an) < 1e-4 * max(1.0, abs(fd)), (i, fd, an)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_means2d_offset_gradient():
    """The screenspace-gradient hook: grad wrt a zero offset is finite and
    nonzero for visible gaussians."""
    cam, params = make_scene(n=8, width=16, height=16)
    offset = jnp.zeros((8, 2))

    def loss(off):
        means, scales, q, opac, shs = params
        out = rasterize_reference(
            means, scales, q, opac, shs,
            jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
            jnp.asarray(cam.camera_center), cam.tanfovx, cam.tanfovy,
            cam.width, cam.height, jnp.zeros(3), means2d_offset=off)
        return jnp.sum((out.color - 0.5) ** 2)

    g = jax.grad(loss)(offset)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0
