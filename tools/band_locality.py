#!/usr/bin/env python
"""Single-chip demonstration of the point-sharded TP design's binning
locality (VERDICT round-2 stretch): render the image as n row bands
(``row_tiles`` + per-band key_cap = key_cap/n, exactly the per-device
problem shape of ``parallel/point_sharded.py``) and compare the summed
band binning/composite time against the full-frame path.

Each band's sort space is ~n x smaller (O(m log^2 m) comparison network)
and band-clamped rects drop out-of-band instances before expansion, so the
aggregate work shrinks even though n bands run sequentially here.  On a
real mesh the n bands run on n devices in parallel.

Usage: python tools/band_locality.py [n_pts] [WxH] [n_bands] [reps]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 921_600
    res = sys.argv[2] if len(sys.argv) > 2 else "1280x720"
    n_bands = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 10
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
        # one jitted lax.scan of ``reps`` iterations with a genuine serial
        # dependency (an output-derived eps perturbs the next rep's input):
        # the round-3 version dispatched reps async calls and blocked only
        # on the last — the tunnel backend elided the unused executions and
        # the full-frame path "measured" 0.35 ms for a 235 ms computation
        # (advisor finding, runlogs/band_locality.out).  Same pattern as
        # bench.py:_breakdown.
        def _perturb(tree, eps):
            leaves, treedef = jax.tree.flatten(tree)
            for i, leaf in enumerate(leaves):
                if (hasattr(leaf, "dtype")
                        and jnp.issubdtype(leaf.dtype, jnp.floating)):
                    leaves[i] = leaf * (1.0 + eps)
                    break
            return jax.tree.unflatten(treedef, leaves)

        @jax.jit
        def scanned(args0):
            def body(eps, _):
                r = f(*_perturb(args0, eps))
                lf = [l for l in jax.tree.leaves(r) if hasattr(l, "dtype")]
                nxt = (jnp.tanh(jnp.nan_to_num(
                    jnp.sum(lf[0].astype(jnp.float32)))) * 1e-12
                       if lf else jnp.asarray(0.0, jnp.float32))
                return nxt, None
            eps, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                                  None, length=reps)
            return eps

        t0 = time.time()
        out = jax.block_until_ready(jax.jit(f)(*a))
        jax.block_until_ready(scanned(a))
        print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        jax.block_until_ready(scanned(a))
        ms = (time.time() - t0) / reps * 1e3
        print(f"{name}: {ms:.2f} ms", flush=True)
        return out, ms

    pre, _ = timeit(
        "preprocess",
        lambda p, s, qq, o, sh: preprocess(
            p, s, qq, o, sh, jnp.asarray(view), jnp.asarray(proj.T),
            jnp.zeros(3), tanf, tanf, W, H),
        *[jnp.asarray(a) for a in (pts, np.exp(scales), q, opac, shs)])

    def bin_and_comp(pr, row_tiles, cap):
        b = R.bin_gaussians(pr, W, H, cap, row_tiles=row_tiles)
        acc, logt = R._composite(R._pack_features(pr, b, cap), b.chunk_tile,
                                 b.tile_starts, b.tile_ends, b.slot_valid,
                                 W, H, row_tiles=row_tiles)
        return acc.sum(), b.overflow

    # full frame
    (_, ovf), t_full = timeit(
        "full bin+composite",
        lambda pr: bin_and_comp(pr, None, key_cap), pre)
    print("  full overflow:", int(ovf), flush=True)

    # n sequential bands at key_cap/n each (the per-device TP problem)
    gy = (H + R.TILE - 1) // R.TILE
    band_cap = -((-key_cap // n_bands) // 128) * 128
    rows = [(i * gy // n_bands, (i + 1) * gy // n_bands)
            for i in range(n_bands)]

    def all_bands(pr):
        tot = jnp.float32(0)
        ovf = jnp.int32(0)
        for rt in rows:
            s, o = bin_and_comp(pr, rt, band_cap)
            tot = tot + s
            ovf = ovf + o
        return tot, ovf

    (_, ovf_b), t_bands = timeit(
        f"{n_bands} bands bin+composite (cap/band={band_cap})",
        all_bands, pre)
    print("  bands overflow total:", int(ovf_b), flush=True)
    print(f"SUMMARY full={t_full:.2f} ms, {n_bands} sequential bands="
          f"{t_bands:.2f} ms, per-band={t_bands / n_bands:.2f} ms "
          f"-> ideal {n_bands}-device band step ~{t_bands / n_bands:.2f} ms "
          f"({t_full / (t_bands / n_bands):.2f}x vs full)", flush=True)


if __name__ == "__main__":
    main()
