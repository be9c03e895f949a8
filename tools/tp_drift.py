#!/usr/bin/env python
"""Quantify the point-sharded (TP) structural-op deviation vs the
replicated path (round-3 verdict Next #7 / PARITY.md known-remaining #2).

Each TP shard allocates densification children from its own free-slot pool
and can saturate locally where the replicated path borrows global headroom,
so a long sharded run may drift from the 1-chip run in alive count and
quality.  This tool runs the SAME miniature training schedule (same views,
same structural cadence, same thresholds) through both paths on the
8-device virtual CPU mesh and reports:

  - alive-count trajectory at every structural event (drift in allocation)
  - final train-view PSNR for both arms (drift in quality)

The schedule is a scaled-down analog of the dnerf default (densify every
``--dens_every`` from 100, prune alongside, one opacity reset mid-run).
Run CPU-only:  JAX_PLATFORMS=cpu MOM_TPU_INTERPRET=1 python tools/tp_drift.py

Usage: tools/tp_drift.py [--iters 400] [--n 96] [--cap 512] [--json out]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("MOM_TPU_INTERPRET", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--cap", type=int, default=512)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--dens_every", type=int, default=60)
    ap.add_argument("--dens_from", type=int, default=60)
    ap.add_argument("--dens_until", type=int, default=300)
    ap.add_argument("--reset_at", type=int, default=200)
    ap.add_argument("--grad_threshold", type=float, default=2e-4)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon-override gotcha
    import jax.numpy as jnp
    import numpy as np

    from mom_tpu import config as C
    from mom_tpu.train.loop import (make_train_step, densify_op, prune_op,
                                    reset_opacity_op)
    from mom_tpu.parallel.point_sharded import (make_points_mesh,
                                                make_ps_train_step,
                                                make_ps_structural_ops,
                                                shard_state, unshard_state,
                                                pad_gt_rows)
    from test_training import _toy_state
    from test_parallel import _cams_and_gts

    W = H = args.res
    opt = C.OptimizationParams()
    hidden = C.ModelHiddenParams()

    # GT comes from a RICHER target state (more points, different seed)
    # so the trainee has real signal and densification pressure
    target, dcfg = _toy_state(n=args.n * 2, capacity=args.cap, seed=7)
    packed, gts = _cams_and_gts(args.views, W, H, target, dcfg, seed=3)
    gts_np = np.asarray(gts)

    def psnr_of(state, step_full, is_tp, hpad=0):
        # evaluate by one frozen forward per view through the same step fn
        # (loss metric -> psnr) so both arms score identically
        vals = []
        for v in range(args.views):
            if is_tp:
                cam = {k: jnp.asarray(vv[v]) for k, vv in packed.items()}
                gt = jnp.asarray(pad_gt_rows(gts_np[v], hpad))
            else:
                cam = {k: jnp.asarray(vv[v:v + 1]) for k, vv in packed.items()}
                gt = jnp.asarray(gts_np[v:v + 1])
            # the step donates its state argument — score a copy so the
            # caller's state (and the next view's eval) stay valid
            copy = jax.tree.map(
                lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
                state)
            _, m = step_full(copy, cam, gt,
                             jnp.asarray(10_000.0, jnp.float32),
                             jnp.asarray(0, jnp.int32))
            vals.append(float(m["psnr"]))
        return float(np.mean(vals))

    events = []

    def run_replicated():
        state, _ = _toy_state(n=args.n, capacity=args.cap, seed=0)
        step = make_train_step(opt, hidden, dcfg, W, H, "coarse",
                               spatial_lr_scale=3.0, bg=(0, 0, 0),
                               key_cap=4096, backend="tiled")
        alive_log = []
        t0 = time.time()
        for it in range(1, args.iters + 1):
            vi = (it - 1) % args.views
            camb = {k: jnp.asarray(v[vi:vi + 1]) for k, v in packed.items()}
            gtb = jnp.asarray(gts_np[vi:vi + 1])
            state, m = step(state, camb, gtb,
                            jnp.asarray(float(it), jnp.float32),
                            jnp.asarray(0, jnp.int32))
            if (args.dens_from <= it <= args.dens_until
                    and it % args.dens_every == 0):
                state = densify_op(state, jnp.asarray(args.grad_threshold),
                                   jnp.asarray(opt.percent_dense),
                                   jnp.asarray(3.0))
                state = prune_op(state, jnp.asarray(opt.opacity_threshold_coarse),
                                 jnp.asarray(3.0), jnp.asarray(-1.0),
                                 use_size=False)
                alive_log.append((it, int(state.gauss.num_alive)))
            if it == args.reset_at:
                state = reset_opacity_op(state)
        dt = time.time() - t0
        p = psnr_of(state, step, is_tp=False)
        return {"alive_events": alive_log, "final_alive":
                int(state.gauss.num_alive), "psnr": p, "train_s": round(dt, 1)}

    def run_tp():
        state, _ = _toy_state(n=args.n, capacity=args.cap, seed=0)
        mesh = make_points_mesh(8)
        build, band_h, hpad = make_ps_train_step(
            mesh, opt, hidden, dcfg, W, H, "coarse", spatial_lr_scale=3.0,
            bg=(0, 0, 0), key_cap=4096)
        step = build(state)
        dens, prune, reset = make_ps_structural_ops(mesh, state)
        state = shard_state(state, mesh)
        alive_log = []
        t0 = time.time()
        for it in range(1, args.iters + 1):
            vi = (it - 1) % args.views
            cam = {k: jnp.asarray(v[vi]) for k, v in packed.items()}
            gt = jnp.asarray(pad_gt_rows(gts_np[vi], hpad))
            state, m = step(state, cam, gt,
                            jnp.asarray(float(it), jnp.float32),
                            jnp.asarray(0, jnp.int32))
            if (args.dens_from <= it <= args.dens_until
                    and it % args.dens_every == 0):
                state, n_alive = dens(state, jnp.asarray(args.grad_threshold),
                                      jnp.asarray(opt.percent_dense),
                                      jnp.asarray(3.0))
                state, n_alive = prune(
                    state, jnp.asarray(opt.opacity_threshold_coarse),
                    jnp.asarray(3.0), jnp.asarray(-1.0))
                alive_log.append((it, int(n_alive)))
            if it == args.reset_at:
                state, _n = reset(state, jnp.asarray(0.0))
        dt = time.time() - t0
        p = psnr_of(state, step, is_tp=True, hpad=hpad)
        final = alive_log[-1][1] if alive_log else args.n
        # recount from the unsharded state for exactness
        host = unshard_state(state, mesh)
        final = int(np.asarray(host.gauss.aux.alive).sum())
        return {"alive_events": alive_log, "final_alive": final,
                "psnr": p, "train_s": round(dt, 1)}

    print(f"tp_drift: iters={args.iters} n={args.n} cap={args.cap} "
          f"res={W}x{H} views={args.views}", flush=True)
    rep = run_replicated()
    print(f"replicated: {rep}", flush=True)
    tp = run_tp()
    print(f"tp_8shard:  {tp}", flush=True)

    drift = {
        "alive_drift_final": tp["final_alive"] - rep["final_alive"],
        "alive_drift_pct": round(100.0 * (tp["final_alive"]
                                          - rep["final_alive"])
                                 / max(rep["final_alive"], 1), 2),
        "psnr_drift": round(tp["psnr"] - rep["psnr"], 3),
    }
    cfg = dict(vars(args))
    cfg.pop("json", None)
    out = {"config": cfg, "replicated": rep, "tp_8shard": tp,
           "drift": drift}
    print("DRIFT " + json.dumps(drift), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
