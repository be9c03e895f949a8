#!/usr/bin/env python
"""One-attach production-scale sweep of the MOM_TPU_* optimization gates.

The gates are read from os.environ at TRACE time, so a single process can
build the (expensive) 921k problem once and re-jit the train step per gate
combo — one tunnel attach and one problem build instead of one bench.py
run per combo.  Results bank incrementally to --out as each combo lands
(a tunnel flake mid-sweep loses only the remaining combos).

Usage: python tools/gate_sweep.py [n_pts] [WxH] [iters] [--out PATH]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMBOS = [
    # the bwd-gate set is DEFAULT ON since round 5 (+7.3%, this sweep's own
    # r5 measurement): "baseline" pins every gate OFF so speedups stay
    # comparable across rounds, "defaults" measures the shipped config
    ("baseline", {"MOM_TPU_TIME_MM": "0", "MOM_TPU_BLOCK_CUMSUM": "0",
                  "MOM_TPU_SEG_RADIX": "0", "MOM_TPU_BIN_PACK": "0"}),
    ("defaults", {}),
    ("nopack", {"MOM_TPU_BIN_PACK": "0"}),
    # single-gate combos pin the OTHER gates OFF: with default-on gates, a
    # lone "1" would measure the same config as "defaults" and mis-attribute
    # the whole set's gain to one gate (round-5 review finding)
    ("timemm", {"MOM_TPU_TIME_MM": "1", "MOM_TPU_BLOCK_CUMSUM": "0",
                "MOM_TPU_SEG_RADIX": "0", "MOM_TPU_BIN_PACK": "0"}),
    ("blockcumsum", {"MOM_TPU_BLOCK_CUMSUM": "1", "MOM_TPU_TIME_MM": "0",
                     "MOM_TPU_SEG_RADIX": "0", "MOM_TPU_BIN_PACK": "0"}),
    ("segradix", {"MOM_TPU_SEG_RADIX": "1", "MOM_TPU_TIME_MM": "0",
                  "MOM_TPU_BLOCK_CUMSUM": "0", "MOM_TPU_BIN_PACK": "0"}),
    ("binradix", {"MOM_TPU_BIN_RADIX": "1"}),
    ("bwd_all", {"MOM_TPU_TIME_MM": "1", "MOM_TPU_BLOCK_CUMSUM": "1",
                 "MOM_TPU_SEG_RADIX": "1"}),
    ("all_on", {"MOM_TPU_TIME_MM": "1", "MOM_TPU_BLOCK_CUMSUM": "1",
                "MOM_TPU_SEG_RADIX": "1", "MOM_TPU_BIN_RADIX": "1"}),
    ("all_chunk256", {"MOM_TPU_TIME_MM": "1", "MOM_TPU_BLOCK_CUMSUM": "1",
                      "MOM_TPU_SEG_RADIX": "1", "MOM_TPU_BIN_RADIX": "1",
                      "MOM_TPU_CHUNK": "256"}),
    ("binv2", {"MOM_TPU_BIN_V2": "1"}),
    ("chunk256", {"MOM_TPU_CHUNK": "256"}),
    ("bwd_all_binv2", {"MOM_TPU_TIME_MM": "1", "MOM_TPU_BLOCK_CUMSUM": "1",
                       "MOM_TPU_SEG_RADIX": "1", "MOM_TPU_BIN_V2": "1"}),
]

GATE_KEYS = sorted({k for _, env in COMBOS for k in env})


def run_subproc(n_pts, res, iters, out_path, per_combo_timeout, quiet_s):
    """Parent mode (--subproc): each combo runs in its OWN child process
    and fresh device attach, so one OOM cannot poison the rest — the
    round-3 one-attach sweep lost all 7 combos to the first
    RESOURCE_EXHAUSTED (launched seconds after a bench exit with chip
    memory still held).  The child also imports rasterize with the combo's
    MOM_TPU_CHUNK, fixing the import-time-CHUNK skip."""
    import subprocess
    import time as T

    results = {"n_pts": n_pts, "resolution": res, "iters": iters,
               "mode": "subprocess-isolated", "combos": {}}
    only = os.environ.get("MOM_TPU_SWEEP_ONLY")
    combos = [c for c in COMBOS if not only or c[0] in only.split(",")]
    for i, (name, env) in enumerate(combos):
        child_out = f"{out_path}.{name}.part"
        child_env = dict(os.environ)
        for k in GATE_KEYS:
            child_env.pop(k, None)
        child_env.update(env)
        child_env["MOM_TPU_SWEEP_ONLY"] = name
        cmd = [sys.executable, os.path.abspath(__file__), str(n_pts), res,
               str(iters), "--out", child_out]
        print(f"[sweep-parent] combo {name} -> child", file=sys.stderr,
              flush=True)
        try:
            rc = subprocess.run(cmd, env=child_env,
                                timeout=per_combo_timeout).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        rec = {"error": f"child rc={rc}"}
        try:
            with open(child_out) as f:
                rec = json.load(f)["combos"].get(name, rec)
        except Exception:                                   # noqa: BLE001
            pass
        results["combos"][name] = rec
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[sweep-parent] combo {name}: {rec}", file=sys.stderr,
              flush=True)
        if i + 1 < len(combos):
            T.sleep(quiet_s)   # let the chip/tunnel drain between attaches

    base = results["combos"].get("baseline", {}).get("iters_per_sec")
    if base:
        for rec in results["combos"].values():
            if rec.get("iters_per_sec"):
                rec["speedup_vs_baseline"] = round(
                    rec["iters_per_sec"] / base, 3)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = "/tmp/gate_sweep.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    n_pts = int(args[0]) if len(args) > 0 else 921_600
    res = args[1] if len(args) > 1 else "1280x720"
    iters = int(args[2]) if len(args) > 2 else 8
    if "--subproc" in sys.argv:
        tmo = int(os.environ.get("MOM_TPU_SWEEP_COMBO_TIMEOUT", "900"))
        quiet = int(os.environ.get("MOM_TPU_SWEEP_QUIET", "60"))
        return run_subproc(n_pts, res, iters, out_path, tmo, quiet)
    W, H = [int(v) for v in res.split("x")]

    def log(m):
        print(f"[sweep {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
              flush=True)

    import jax
    import jax.numpy as jnp
    from bench import build_problem, time_chained
    from mom_tpu.train.loop import make_train_step
    from mom_tpu.ops.rasterize import default_key_cap

    jax.devices()
    log(f"backend={jax.default_backend()}")
    state0, deform_cfg, hidden, opt, packed, gts, W, H = build_problem(
        n_pts, W, H)
    key_cap = default_key_cap(n_pts, 4.0)
    log(f"problem built: {n_pts} pts key_cap={key_cap} {W}x{H}")

    results = {"n_pts": n_pts, "resolution": f"{W}x{H}", "iters": iters,
               "combos": {}}

    only = os.environ.get("MOM_TPU_SWEEP_ONLY")
    combos = [c for c in COMBOS if not only or c[0] in only.split(",")]
    for name, env in combos:
        for k in GATE_KEYS:
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            # MOM_TPU_CHUNK is read at rasterize import; a CHUNK combo needs
            # a module reload, which would splinter jit caches — skip unless
            # the module agrees with the requested chunk
            from mom_tpu.ops import rasterize as R
            if int(env.get("MOM_TPU_CHUNK", "128")) != R.CHUNK:
                log(f"{name}: skipped (CHUNK is import-time; rerun with "
                    f"MOM_TPU_CHUNK={env['MOM_TPU_CHUNK']} in the env)")
                results["combos"][name] = {"skipped": "import-time CHUNK"}
                continue
            step = make_train_step(opt, hidden, deform_cfg, W, H, "fine",
                                   spatial_lr_scale=3.0, bg=(0, 0, 0),
                                   key_cap=key_cap, backend="tiled")
            camb = {k: jnp.asarray(v[0:1]) for k, v in packed.items()}
            gtb = jnp.asarray(gts[0:1])
            # the step donates its input state: give each combo its own copy
            st = jax.tree.map(jnp.copy, state0)
            tc = time.time()
            st, m = step(st, camb, gtb, jnp.asarray(1.0, jnp.float32),
                         jnp.asarray(3, jnp.int32))
            jax.block_until_ready(m["loss"])
            compile_s = time.time() - tc
            ips, st, m = time_chained(step, st, iters, packed, gts)
            rec = {"iters_per_sec": round(ips, 4),
                   "step_ms": round(1e3 / ips, 1),
                   "compile_s": round(compile_s, 1),
                   "loss": float(m["loss"]), "psnr": float(m["psnr"]),
                   "overflow": int(m["overflow"])}
            log(f"{name}: {rec}")
            results["combos"][name] = rec
        except Exception as e:                                # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {e}")
            results["combos"][name] = {"error": f"{type(e).__name__}: {e}"}
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    base = results["combos"].get("baseline", {}).get("iters_per_sec")
    if base:
        for name, rec in results["combos"].items():
            if rec.get("iters_per_sec"):
                rec["speedup_vs_baseline"] = round(
                    rec["iters_per_sec"] / base, 3)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
