#!/usr/bin/env python
"""Benchmark: fine-stage 4DGS training throughput at the REFERENCE scale —
512x512 with 262,144 initial gaussians (the live pipeline's init count,
gaussian_renderer/__init__.py:86) and the real demo/scene_0 image as GT —
vs the pure-JAX oracle rasterizer baseline (BASELINE.json configs[0]; the
reference publishes no numbers of its own, BASELINE.md).

The oracle baseline is measured at 65,536 points (it is O(P * pixels) by
design and would take minutes at 262k) and scaled linearly in P to the
bench point count; the scaling is exact for its per-pixel-per-gaussian
inner loop and reported explicitly.

Render FPS note (reconciling round-1's 30 FPS bench vs ~700 FPS RESULTS
numbers): splat rendering cost scales with the LIVE INSTANCE count (points
x tiles touched), not the resolution alone.  A freshly initialized 262k
cloud has large untrained gaussians (~8 tiles each, ~2M instances); a
TRAINED scene prunes to ~60k tight gaussians (~4 tiles, ~0.2M instances)
and renders an order of magnitude faster.  The bench reports both the
instance count and FPS at this (heavy, untrained) configuration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def _scene0_gts(W, H, n_views=4):
    """GT views from the demo/scene_0 photo (slightly shifted crops stand in
    for the 25 synthetic views — real image statistics, static geometry)."""
    from PIL import Image
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "demo", "scene_0", "image.png")
    img = Image.open(path).convert("RGB")
    iw, ih = img.size
    gts = []
    for i in range(n_views):
        off = int(i * 8)
        crop = img.crop((off, 0, off + ih, ih)).resize((W, H), Image.BICUBIC)
        gts.append(np.asarray(crop, np.uint8))
    return np.stack(gts)


def build_problem(n_pts=262_144, W=512, H=512):
    import jax
    import jax.numpy as jnp
    from mom_tpu import config as C
    from mom_tpu.models import gaussians as G
    from mom_tpu.models import deformation as D
    from mom_tpu.pipeline import deform_config_from_hidden, pick_capacity
    from mom_tpu.cameras import Camera, pack_cameras
    from mom_tpu.train import optim
    from mom_tpu.train.loop import TrainState, _params_by_group

    opt = C.OptimizationParams()
    capacity = pick_capacity(n_pts, opt)          # the live-pipeline cap
    rng = np.random.RandomState(0)
    # landscape-like cloud: one point per pixel on a depth surface, exactly
    # like the unprojected 512^2 init of the real pipeline
    side = int(np.sqrt(n_pts))
    xs, ys = np.meshgrid(np.linspace(-1.2, 1.2, side),
                         np.linspace(-0.9, 0.9, side))
    depth = 4.0 + 2.0 * ys + 0.3 * np.sin(xs * 7) + rng.rand(side, side) * 0.05
    pts = np.stack([xs * depth / 4.0, ys * depth / 4.0, depth],
                   -1).reshape(-1, 3).astype(np.float32)[:n_pts]
    gts = _scene0_gts(W, H)
    cols = (gts[0].reshape(-1, 3).astype(np.float32) / 255.0)[:n_pts]
    flow = (rng.randn(n_pts, 3) * 0.002).astype(np.float32)
    gauss = G.create_from_pcd(pts, cols, flow, 2.0, capacity)

    hidden = C.ModelHiddenParams()
    hidden.multires = [1, 2]
    hidden.defor_depth = 0
    hidden.kplanes_config = {
        "grid_dimensions": 2, "input_coordinate_dim": 4,
        "output_coordinate_dim": 32, "resolution": [64, 64, 64, 50]}
    deform_cfg = deform_config_from_hidden(hidden)
    deform = D.init_deformation(jax.random.PRNGKey(0), deform_cfg)

    cams = []
    for i in range(4):
        th = (i - 1.5) * 0.05
        R = np.array([[np.cos(th), 0, -np.sin(th)], [0, 1, 0],
                      [np.sin(th), 0, np.cos(th)]])
        cams.append(Camera(R=R, T=rng.randn(3) * 0.02, fovx=0.8, fovy=0.8,
                           width=W, height=H, time=i / 3.0, frame_num=i))
    packed = pack_cameras(cams)

    groups = _params_by_group(gauss.params, deform)
    state = TrainState(gauss=gauss, deform=deform,
                       adam=optim.init_adam(groups),
                       rng=jax.random.PRNGKey(0))
    return state, deform_cfg, hidden, opt, packed, gts, W, H


def time_steps(step, state, packed, gts, n_iters):
    import jax
    import jax.numpy as jnp
    camb = {k: jnp.asarray(v[0:1]) for k, v in packed.items()}
    gtb = jnp.asarray(gts[0:1])
    state, m = step(state, camb, gtb, jnp.asarray(1.0, jnp.float32),
                    jnp.asarray(3, jnp.int32))
    jax.block_until_ready(m["loss"])
    t0 = time.time()
    for i in range(n_iters):
        vi = i % 4
        camb = {k: jnp.asarray(v[vi:vi + 1]) for k, v in packed.items()}
        gtb = jnp.asarray(gts[vi:vi + 1])
        state, m = step(state, camb, gtb,
                        jnp.asarray(float(i + 2), jnp.float32),
                        jnp.asarray(3, jnp.int32))
    jax.block_until_ready(m["loss"])
    dt = time.time() - t0
    return n_iters / dt, state, {k: float(v) for k, v in m.items()}


def main():
    import jax
    import jax.numpy as jnp
    from mom_tpu.train.loop import make_train_step
    from mom_tpu.ops.rasterize import default_key_cap

    N_PTS = 262_144
    state, deform_cfg, hidden, opt, packed, gts, W, H = build_problem(N_PTS)
    key_cap = default_key_cap(N_PTS, 4.0)

    step_tiled = make_train_step(opt, hidden, deform_cfg, W, H, "fine",
                                 spatial_lr_scale=3.0, bg=(0, 0, 0),
                                 key_cap=key_cap, backend="tiled")
    tiled_ips, state_t, m = time_steps(step_tiled, state, packed, gts, 30)

    # render-only throughput at the same (untrained, heavy) configuration
    from mom_tpu.pipeline import make_render_jit
    rf = make_render_jit(state_t, deform_cfg, W, H, (0, 0, 0), stage="fine",
                         backend="tiled", key_cap=key_cap)
    cam0 = {k: jnp.asarray(v[0]) for k, v in packed.items()}
    img = rf(state_t.gauss.params, state_t.gauss.aux, state_t.deform, cam0)
    img.block_until_ready()
    t0 = time.time()
    for _ in range(30):
        img = rf(state_t.gauss.params, state_t.gauss.aux, state_t.deform,
                 cam0)
    img.block_until_ready()
    render_fps = 30 / (time.time() - t0)

    # oracle baseline at 65k, scaled linearly in P (see module docstring)
    ORACLE_PTS = 65_536
    state2, deform_cfg2, hidden2, opt2, packed2, gts2, _, _ = \
        build_problem(ORACLE_PTS)
    step_ref = make_train_step(opt2, hidden2, deform_cfg2, W, H, "fine",
                               spatial_lr_scale=3.0, bg=(0, 0, 0),
                               backend="reference")
    ref_ips_65k, _, _ = time_steps(step_ref, state2, packed2, gts2, 3)
    ref_ips = ref_ips_65k * (ORACLE_PTS / N_PTS)

    result = {
        "metric": "4dgs_fine_train_iters_per_sec_512px_262k",
        "value": round(tiled_ips, 3),
        "unit": "iter/s",
        "vs_baseline": round(tiled_ips / ref_ips, 3),
        "extra": {
            "n_points": N_PTS,
            "capacity": int(state_t.gauss.capacity),
            "key_cap_instances": key_cap,
            "render_fps_512px_untrained": round(render_fps, 2),
            "train_loss": m["loss"],
            "train_psnr": m["psnr"],
            "oracle_iters_per_sec_65k": round(ref_ips_65k, 4),
            "oracle_extrapolation": "linear in P (O(P*pixels) oracle)",
            "gt": "demo/scene_0 photo crops",
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
