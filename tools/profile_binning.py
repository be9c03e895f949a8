#!/usr/bin/env python
"""Targeted production-scale profile: splits the render forward into
(preprocess | binning | pack+composite) with the minimum number of device
compiles (3), for tunnel windows where each compile costs minutes.

Usage: python tools/profile_binning.py [n_pts] [WxH] [reps]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 921_600
    res = sys.argv[2] if len(sys.argv) > 2 else "1280x720"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    W, H = [int(v) for v in res.split("x")]

    import jax
    import jax.numpy as jnp
    from mom_tpu.ops import rasterize as R
    from mom_tpu.ops.preprocess import preprocess
    from mom_tpu.utils.sh import rgb2sh

    rng = np.random.RandomState(0)
    side = int(np.sqrt(n_pts))
    xs, ys = np.meshgrid(np.linspace(-1.2, 1.2, side),
                         np.linspace(-0.9, 0.9, side))
    depth = 4.0 + 2.0 * ys + 0.3 * np.sin(xs * 7) + rng.rand(side, side) * .05
    pts = np.stack([xs * depth / 4.0, ys * depth / 4.0, depth],
                   -1).reshape(-1, 3).astype(np.float32)[:n_pts]
    scales = np.full((n_pts, 3), np.log(3.2 / side), np.float32)
    q = np.zeros((n_pts, 4), np.float32); q[:, 0] = 1
    opac = np.full(n_pts, 0.7, np.float32)
    shs = np.zeros((n_pts, 16, 3), np.float32)
    shs[:, 0] = np.asarray(rgb2sh(rng.rand(n_pts, 3).astype(np.float32)))
    view = np.eye(4, dtype=np.float32)
    tanf = 0.41
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = 1 / tanf; proj[1, 1] = 1 / tanf
    proj[2, 2] = 1.001; proj[2, 3] = -0.1; proj[3, 2] = 1.0
    key_cap = R.default_key_cap(n_pts, 4.0)

    def timeit(name, f, *a):
        jf = jax.jit(f)
        t0 = time.time()
        out = jax.block_until_ready(jf(*a))
        print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        for _ in range(reps):
            out = jf(*a)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / reps * 1e3
        print(f"{name}: {ms:.1f} ms", flush=True)
        return out, ms

    args = [jnp.asarray(a) for a in
            (pts, np.exp(scales), q, opac, shs)]
    pre, t_pre = timeit(
        "preprocess",
        lambda p, s, qq, o, sh: preprocess(
            p, s, qq, o, sh, jnp.asarray(view), jnp.asarray(proj.T),
            jnp.zeros(3), tanf, tanf, W, H), *args)

    binning, t_bin = timeit(
        "bin_gaussians",
        lambda pr: R.bin_gaussians(pr, W, H, key_cap), pre)
    print("num_keys:", int(binning.num_keys),
          "overflow:", int(binning.overflow), flush=True)

    _, t_comp = timeit(
        "pack+composite_fwd",
        lambda pr, b: R._composite(
            R._pack_features(pr, b, key_cap), b.chunk_tile, b.tile_starts,
            b.tile_ends, b.slot_valid, W, H), pre, binning)

    print(f"TOTAL fwd ~= {t_pre + t_bin + t_comp:.1f} ms "
          f"(pre {t_pre:.1f} | bin {t_bin:.1f} | composite {t_comp:.1f})",
          flush=True)


if __name__ == "__main__":
    main()
