"""Native runtime module: compile, PLY write parity, PNG batch, CPU KNN."""

import os

import numpy as np
import pytest

from mom_tpu import native


def test_native_available():
    assert native.available(), "native module failed to compile/load"


def test_native_ply_write_matches_python(tmp_path):
    from mom_tpu.data.ply import save_gaussian_ply, load_gaussian_ply
    rng = np.random.RandomState(0)
    n = 100
    args = dict(xyz=rng.randn(n, 3).astype(np.float32),
                features_dc=rng.randn(n, 1, 3).astype(np.float32),
                features_rest=rng.randn(n, 15, 3).astype(np.float32),
                opacity=rng.randn(n, 1).astype(np.float32),
                scaling=rng.randn(n, 3).astype(np.float32),
                rotation=rng.randn(n, 4).astype(np.float32))
    path = str(tmp_path / "pc.ply")
    save_gaussian_ply(path, **args)
    back = load_gaussian_ply(path)
    for k in args:
        np.testing.assert_allclose(back[k], args[k], atol=0)


def test_native_png_batch(tmp_path):
    if not native.available():
        pytest.skip("no native lib")
    from PIL import Image
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 255, (4, 24, 32, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"{i}.png") for i in range(4)]
    assert native.png_write_batch(paths, frames)
    for i, p in enumerate(paths):
        arr = np.asarray(Image.open(p))
        np.testing.assert_array_equal(arr, frames[i])


def test_native_knn_close_to_bruteforce():
    if not native.available():
        pytest.skip("no native lib")
    from tests.test_ops import brute_force_3nn
    rng = np.random.RandomState(2)
    pts = rng.rand(1500, 3).astype(np.float32)
    got = native.knn3_morton(pts, window=32)
    exact = brute_force_3nn(pts.astype(np.float64))
    assert np.all(got >= exact - 1e-6)
    rel = (got - exact) / np.maximum(exact, 1e-12)
    assert np.median(rel) < 0.05
