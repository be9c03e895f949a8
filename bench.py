#!/usr/bin/env python
"""Benchmark: fine-stage 4DGS training step throughput at 512x512 with the
tile-binned Pallas rasterizer, vs the pure-JAX oracle rasterizer baseline
(BASELINE.json configs[0] — the reference publishes no numbers of its own,
BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def build_problem(n_pts=65536, W=512, H=512, capacity=None):
    import jax
    import jax.numpy as jnp
    from mom_tpu import config as C
    from mom_tpu.models import gaussians as G
    from mom_tpu.models import deformation as D
    from mom_tpu.pipeline import deform_config_from_hidden
    from mom_tpu.cameras import Camera, pack_cameras
    from mom_tpu.train import optim
    from mom_tpu.train.loop import TrainState, _params_by_group, make_train_step

    capacity = capacity or ((int(n_pts * 1.2) + 1023) // 1024) * 1024
    rng = np.random.RandomState(0)
    # landscape-like cloud: one point per 2x2 pixel block on a depth surface
    side = int(np.sqrt(n_pts))
    xs, ys = np.meshgrid(np.linspace(-1.2, 1.2, side),
                         np.linspace(-0.9, 0.9, side))
    depth = 4.0 + 2.0 * ys + 0.3 * np.sin(xs * 7) + rng.rand(side, side) * 0.05
    pts = np.stack([xs * depth / 4.0, ys * depth / 4.0, depth],
                   -1).reshape(-1, 3).astype(np.float32)[:n_pts]
    cols = rng.uniform(0, 1, (n_pts, 3)).astype(np.float32)
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

    opt = C.OptimizationParams()
    cams = []
    for i in range(4):
        th = (i - 1.5) * 0.05
        R = np.array([[np.cos(th), 0, -np.sin(th)], [0, 1, 0],
                      [np.sin(th), 0, np.cos(th)]])
        cams.append(Camera(R=R, T=rng.randn(3) * 0.02, fovx=0.8, fovy=0.8,
                           width=W, height=H, time=i / 3.0, frame_num=i))
    packed = pack_cameras(cams)
    gts = rng.randint(0, 255, (4, H, W, 3), dtype=np.uint8)

    groups = _params_by_group(gauss.params, deform)
    state = TrainState(gauss=gauss, deform=deform,
                       adam=optim.init_adam(groups),
                       rng=jax.random.PRNGKey(0))
    return state, deform_cfg, hidden, opt, packed, gts, W, H


def time_steps(step, state, packed, gts, n_iters, W, H):
    import jax
    import jax.numpy as jnp
    camb = {k: jnp.asarray(v[0:1]) for k, v in packed.items()}
    gtb = jnp.asarray(gts[0:1])
    # warm up / compile
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
    return n_iters / dt, state, float(m["loss"])


def main():
    import jax
    from mom_tpu.train.loop import make_train_step
    from mom_tpu.ops.rasterize import default_key_cap

    state, deform_cfg, hidden, opt, packed, gts, W, H = build_problem()
    key_cap = default_key_cap(state.gauss.capacity, 4.0)

    step_tiled = make_train_step(opt, hidden, deform_cfg, W, H, "fine",
                                 spatial_lr_scale=3.0, bg=(0, 0, 0),
                                 key_cap=key_cap, backend="tiled")
    tiled_ips, state_t, loss_t = time_steps(step_tiled, state, packed, gts,
                                            30, W, H)

    # render-only throughput (the reference's headline FPS print,
    # render_4DGS.py:71)
    import jax.numpy as jnp
    import time as _time
    from mom_tpu.pipeline import make_render_jit
    rf = make_render_jit(state_t, deform_cfg, W, H, (0, 0, 0), stage="fine",
                         backend="tiled", key_cap=key_cap)
    cam0 = {k: jnp.asarray(v[0]) for k, v in packed.items()}
    img = rf(state_t.gauss.params, state_t.gauss.aux, state_t.deform, cam0)
    img.block_until_ready()
    t0 = _time.time()
    for _ in range(30):
        img = rf(state_t.gauss.params, state_t.gauss.aux, state_t.deform, cam0)
    img.block_until_ready()
    render_fps = 30 / (_time.time() - t0)

    # oracle baseline (few iters; it's slow by design)
    state2, *_ = build_problem()
    step_ref = make_train_step(opt, hidden, deform_cfg, W, H, "fine",
                               spatial_lr_scale=3.0, bg=(0, 0, 0),
                               backend="reference")
    ref_ips, _, loss_r = time_steps(step_ref, state2, packed, gts, 3, W, H)

    result = {
        "metric": "4dgs_fine_train_iters_per_sec_512px_65k",
        "value": round(tiled_ips, 3),
        "unit": "iter/s",
        "vs_baseline": round(tiled_ips / ref_ips, 3),
        "extra": {
            "render_fps_512px": round(render_fps, 2),
            "oracle_iters_per_sec": round(ref_ips, 3),
            "loss_finite": bool(np.isfinite(loss_t)),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
