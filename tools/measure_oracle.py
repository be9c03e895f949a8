#!/usr/bin/env python
"""Measure the pure-JAX oracle (reference-backend) training step at the
bench scale and bank it into ORACLE_BANK.json, so bench.py's ``vs_baseline``
is a MEASURED ratio instead of a linear-in-P extrapolation of the round-1
65k anchor (round-3 verdict Weak #7 / Next #8).

Run once per chip/scale — bench.py caches the result via the bank file.
The oracle step is slow (O(P*pixels): ~17s/step at 262k/512^2 by the
extrapolation this tool replaces), so it times a handful of chained steps.

Usage:
  python tools/measure_oracle.py [--pts 262144] [--res 512] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pts", type=int, default=262_144)
    ap.add_argument("--res", default="512")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "ORACLE_BANK.json"))
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon-override gotcha
    import jax.numpy as jnp
    from bench import build_problem
    from mom_tpu.train.loop import make_train_step

    W, H = ([int(v) for v in args.res.split("x")] * 2)[:2]
    jax.devices()
    print(f"backend={jax.default_backend()}", flush=True)
    state, deform_cfg, hidden, opt, packed, gts, W, H = build_problem(
        args.pts, W, H)
    step = make_train_step(opt, hidden, deform_cfg, W, H, "fine",
                           spatial_lr_scale=3.0, bg=(0, 0, 0),
                           key_cap=None, backend="reference")
    camb = {k: jnp.asarray(v[0:1]) for k, v in packed.items()}
    gtb = jnp.asarray(gts[0:1])
    tc = time.time()
    state, m = step(state, camb, gtb, jnp.asarray(1.0, jnp.float32),
                    jnp.asarray(3, jnp.int32))
    jax.block_until_ready(m["loss"])
    print(f"oracle compiled+first in {time.time() - tc:.1f}s", flush=True)

    t0 = time.time()
    for i in range(args.iters):
        camb = {k: jnp.asarray(v[i % len(gts):i % len(gts) + 1])
                for k, v in packed.items()}
        gtb = jnp.asarray(gts[i % len(gts):i % len(gts) + 1])
        state, m = step(state, camb, gtb,
                        jnp.asarray(2.0 + i, jnp.float32),
                        jnp.asarray(3, jnp.int32))
    jax.block_until_ready(m["loss"])
    dt = time.time() - t0
    ips = args.iters / dt
    print(f"oracle: {ips:.4f} it/s over {args.iters} chained iters "
          f"({dt:.1f}s)", flush=True)

    rec = {"n_points": args.pts, "resolution": f"{W}x{H}",
           "iters_per_sec": round(ips, 4),
           "backend": jax.default_backend(),
           "detail": {"n_iters": args.iters, "elapsed_s": round(dt, 1),
                      "loss": float(m["loss"])},
           "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    bank = []
    if os.path.exists(args.out):
        try:
            old = json.load(open(args.out))
            bank = old if isinstance(old, list) else [old]
        except Exception:                                     # noqa: BLE001
            bank = []
    bank = [r for r in bank
            if not (r.get("n_points") == args.pts
                    and r.get("resolution") == f"{W}x{H}")] + [rec]
    with open(args.out, "w") as f:
        json.dump(bank, f, indent=1)
    print(f"banked -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
