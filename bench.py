#!/usr/bin/env python
"""Benchmark: fine-stage 4DGS training throughput at the REFERENCE scale —
512x512 with 262,144 initial gaussians (the live pipeline's init count,
gaussian_renderer/__init__.py:86) and the real demo/scene_0 image as GT.

Budget-safe structure (round-2 lesson: the driver run timed out before the
single JSON line was printed):

- ONE essential device compile (the fine-stage train step); everything else
  is best-effort and time-gated.
- A SIGALRM watchdog prints whatever has been banked and exits before the
  driver budget can expire.
- The pure-JAX oracle baseline is not re-measured in-run (it is an
  O(P*pixels) graph whose compile alone can starve the budget through the
  tunnel): vs_baseline prefers a MEASURED record banked by
  tools/measure_oracle.py in ORACLE_BANK.json (exact n_points+resolution
  match first, then a linear-in-P rescale of a same-resolution record),
  falling back to the round-1 measurement — 0.234 it/s at 65,536 points
  (BENCH_r01.json) — scaled linearly in P (exact for the oracle's
  per-pixel-per-gaussian inner loop).
- MFU: XLA cost-analysis FLOPs of the compiled step (sort/gather movement
  counts as 0, as it should) PLUS analytic FLOPs of the two Pallas
  compositing kernels (custom calls are invisible to cost analysis),
  divided by measured step time and the v5e bf16 peak.
- Step-time breakdown (bin / composite fwd / full fwd / fwd+bwd+adam) runs
  only while enough budget remains; partial results still ship.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline",
"extra": {...}}.  All progress chatter goes to stderr.
"""

import json
import os
import signal
import sys
import threading
import time

import numpy as np

T0 = time.time()
BUDGET = float(os.environ.get("MOM_TPU_BENCH_BUDGET", "900"))  # seconds
# device-attach deadline: a wedged tunnel can block jax.devices() forever
# INSIDE a C call, where a SIGALRM handler never runs — only a thread can
# still act.  If the chip is unreachable by then, ship the banked result
# of the last successful run (clearly labelled stale) instead of nothing.
ATTACH_BUDGET = float(os.environ.get("MOM_TPU_BENCH_ATTACH_BUDGET", "300"))
BANK_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_BANK.json")
V5E_PEAK_BF16 = 197e12  # TPU v5e peak (bf16 TFLOP/s); fp32 runs below this

# round-1 oracle baseline on this chip (BENCH_r01.json): pure-JAX reference
# rasterizer training step at 65,536 points, 512x512
ORACLE_IPS_65K = 0.234
ORACLE_PTS = 65_536
ORACLE_BANK_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "ORACLE_BANK.json")

# Compute-path gate env vars (ops/rasterize.py, ops/scanprims.py,
# train/loop.py): a bench run with ANY of these set is an A/B experiment,
# not the driver-official configuration — it must neither overwrite the
# stale-fallback bank nor ship the banked number as its own (round-3
# advisor finding: a MOM_TPU_BIN_RADIX=1 A/B run silently overwrote the
# default-path bank).
GATE_ENV_VARS = ("MOM_TPU_BIN_RADIX", "MOM_TPU_BIN_V2",
                 "MOM_TPU_BLOCK_CUMSUM", "MOM_TPU_CHUNK",
                 "MOM_TPU_MXU_SPLIT", "MOM_TPU_SEG_RADIX",
                 "MOM_TPU_INTERPRET", "MOM_TPU_TIME_MM",
                 "MOM_TPU_BIN_PACK", "MOM_TPU_SCAN_UNROLL",
                 "MOM_TPU_RENDER_BANDS")


def _active_gates():
    return {k: os.environ[k] for k in GATE_ENV_VARS if k in os.environ}


def _off_default_config():
    """True for any run that is not the driver-official configuration."""
    return (os.environ.get("MOM_TPU_BENCH_CPU") == "1"
            or "MOM_TPU_BENCH_PTS" in os.environ
            or "MOM_TPU_BENCH_RES" in os.environ
            or bool(_active_gates()))


def _oracle_baseline(n_pts: int, res: str):
    """(iters_per_sec, provenance dict).  Prefers a MEASURED oracle number
    at this exact scale (tools/measure_oracle.py banks one into
    ORACLE_BANK.json); falls back to the round-1 65k measurement scaled
    linearly in P (exact for the oracle's O(P*pixels) inner loop)."""
    try:
        with open(ORACLE_BANK_PATH) as f:
            bank = json.load(f)
        recs = bank if isinstance(bank, list) else [bank]
        # two passes: an exact (n_points, resolution) record anywhere in the
        # bank wins outright (measure_oracle.py APPENDS new records, so a
        # single pass would let an older same-resolution record shadow a
        # later exact measurement — round-4 advisor finding).  Both passes
        # scan NEWEST-FIRST: among several exact records the most recent
        # measurement (typically more iterations) wins.
        for rec in reversed(recs):
            if rec.get("n_points") == n_pts and rec.get("resolution") == res:
                prov = {"iters_per_sec": rec["iters_per_sec"],
                        "provenance": "measured",
                        "measured_at": rec.get("measured_at"),
                        "detail": rec.get("detail")}
                return float(rec["iters_per_sec"]), prov
        for rec in reversed(recs):
            # measured at another point count, same resolution: linear-in-P
            # rescale of a measurement at this resolution still beats the
            # round-1 65k anchor
            if rec.get("resolution") == res and rec.get("n_points"):
                ips = float(rec["iters_per_sec"]) * rec["n_points"] / n_pts
                prov = {"iters_per_sec": round(ips, 4),
                        "provenance": (f"measured at {rec['n_points']} pts, "
                                       "linear-in-P rescale"),
                        "measured_at": rec.get("measured_at")}
                return ips, prov
    except FileNotFoundError:
        pass
    except Exception as e:                                    # noqa: BLE001
        log(f"oracle bank unreadable: {e}")
    ips = ORACLE_IPS_65K * (ORACLE_PTS / n_pts)
    return ips, {"iters_per_sec_65k": ORACLE_IPS_65K,
                 "provenance": "BENCH_r01.json round-1 measurement on this "
                               "chip",
                 "extrapolation": "linear in P (O(P*pixels) oracle)"}

_result = {"metric": "4dgs_fine_train_iters_per_sec_512px_262k",
           "value": None, "unit": "iter/s", "vs_baseline": None,
           "extra": {"status": "building"}}
_printed = False
_print_lock = threading.Lock()


def _print_once():
    global _printed
    with _print_lock:   # SIGALRM handler and budget thread can race here
        if _printed:
            return
        _printed = True
    print(json.dumps(_result), flush=True)


def _alarm(_sig, _frm):
    if _result["value"] is None:
        # the live run produced no measurement at all (e.g. a compile
        # wedged after attach): the banked result still beats a null
        _flush_stale_bank("live run produced no measurement within budget")
    _result["extra"]["status"] = "watchdog_flush"
    _result["extra"]["elapsed_s"] = round(time.time() - T0, 1)
    _print_once()
    os._exit(0)


_attached = threading.Event()


def _flush_stale_bank(reason):
    """Device never attached: emit the last successful run's banked result,
    loudly labelled stale (an honest number with provenance beats rc=124).
    Only the driver-official configuration may fall back to the bank: a
    CPU smoke run or a scale-overridden A/B run must never ship the banked
    TPU number as its own."""
    if _off_default_config():
        _result["extra"] = {"status": f"no_data: {reason} "
                            "(bank fallback disabled off-default-config)",
                            "active_gates": _active_gates()}
        _result["extra"]["elapsed_s"] = round(time.time() - T0, 1)
        _print_once()
        os._exit(0)
    try:
        with open(BANK_PATH) as f:
            banked = json.load(f)
        _result.update(metric=banked["metric"], value=banked["value"],
                       unit=banked["unit"], vs_baseline=banked["vs_baseline"])
        _result["extra"] = dict(banked.get("extra", {}))
        _result["extra"]["status"] = (
            f"STALE_BANK: {reason}; value is the banked measurement of a "
            f"previous successful run on this chip")
        _result["extra"]["stale"] = True
        _result["extra"]["banked_at"] = banked.get("banked_at")
        # the bank may predate a measured oracle (round 3 banked the
        # linear-in-P extrapolated ratio); the value is old but the
        # baseline should be the best-known one at flush time
        try:
            ips, prov = _oracle_baseline(262_144, "512x512")
            if prov.get("provenance") == "measured" and _result["value"]:
                _result["vs_baseline"] = round(_result["value"] / ips, 1)
                _result["extra"]["oracle_baseline"] = prov
                _result["extra"]["vs_baseline_note"] = (
                    "recomputed against the measured oracle at flush time")
        except Exception:                                     # noqa: BLE001
            pass
    except Exception as e:                                    # noqa: BLE001
        _result["extra"] = {"status": f"no_data: {reason}; no bank ({e})"}
    _result["extra"]["elapsed_s"] = round(time.time() - T0, 1)
    _print_once()
    os._exit(0)


def _budget_thread():
    """Thread-based watchdog: runs even while the main thread is blocked
    inside a C call (wedged tunnel attach), where SIGALRM cannot fire."""
    if not _attached.wait(min(ATTACH_BUDGET, max(BUDGET - 60, 30))):
        _flush_stale_bank(
            f"device not attached within {ATTACH_BUDGET:.0f}s (wedged tunnel)")
    remain = (T0 + BUDGET - 45) - time.time()
    if remain > 0:
        time.sleep(remain)
    if not _printed:
        _alarm(None, None)


def _bank_result():
    try:
        banked = dict(_result)
        banked["banked_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                            time.gmtime())
        with open(BANK_PATH, "w") as f:
            json.dump(banked, f)
    except Exception as e:                                    # noqa: BLE001
        log(f"bank write failed: {e}")


def log(msg):
    print(f"[bench +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _scene0_gts(W, H, n_views=4):
    """GT views from the demo/scene_0 photo (shifted crops stand in for the
    25 synthetic views — real image statistics, static geometry)."""
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


def pallas_flops(key_cap, width, height):
    """Analytic FLOPs of the chunk-grid compositing kernels per call
    (invisible to XLA cost analysis).  Per [256-pixel x 128-instance] chunk:
    forward = lane-cumsum tri-matmul (2*256*128*128) + contribution matmul
    (2*256*128*4) + ~30 VPU elementwise ops; backward replays the walk with
    a second cumsum and three extra matmuls (~2x forward + 3*2*256*128*4)."""
    from mom_tpu.ops.rasterize import padded_cap, CHUNK, TILE
    pcap = padded_cap(key_cap, width, height)
    n_chunks = pcap // CHUNK
    pix = TILE * TILE
    mm = 2 * pix * CHUNK * CHUNK          # triangular cumsum matmul
    contrib = 2 * pix * CHUNK * 4
    vpu = 30 * pix * CHUNK
    fwd = n_chunks * (mm + contrib + vpu)
    bwd = n_chunks * (2 * mm + 4 * contrib + 2 * vpu)
    return fwd, bwd


def time_chained(fn, state, n_iters, packed, gts):
    """Sustained state-chained timing (tunnel rule: only trust chained
    measurements — unconsumed executions can be elided).  Views are
    device-resident and sliced on device: per-iteration host->device GT
    uploads would otherwise bound the measurement on a slow tunnel (the
    live training loop pre-uploads the same way)."""
    import jax
    import jax.numpy as jnp
    views = []
    for vi in range(4):
        views.append(({k: jnp.asarray(v[vi:vi + 1]) for k, v in packed.items()},
                      jnp.asarray(gts[vi:vi + 1])))
    jax.block_until_ready(views[-1][1])
    t0 = time.time()
    m = None
    for i in range(n_iters):
        camb, gtb = views[i % 4]
        state, m = fn(state, camb, gtb,
                      jnp.asarray(float(i + 2), jnp.float32),
                      jnp.asarray(3, jnp.int32))
    jax.block_until_ready(m["loss"])
    return n_iters / (time.time() - t0), state, m


def main():
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(max(int(BUDGET - 45), 60))
    threading.Thread(target=_budget_thread, daemon=True).start()

    import jax
    if os.environ.get("MOM_TPU_BENCH_CPU") == "1":
        # harness smoke-testing without touching the chip: this machine's
        # JAX install force-registers the 'axon' TPU platform and IGNORES
        # JAX_PLATFORMS, so the backend must be pinned post-import (same
        # workaround as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("MOM_TPU_INTERPRET", "1")
    import jax.numpy as jnp
    from mom_tpu.train.loop import make_train_step
    from mom_tpu.ops.rasterize import default_key_cap

    jax.devices()          # first backend touch — the attach that can wedge
    _attached.set()
    log(f"backend={jax.default_backend()} budget={BUDGET}s")
    # scale overrides (CPU smoke tests of the harness itself; production-
    # scale profiling via e.g. PTS=921600 RES=1280x720)
    N_PTS = int(os.environ.get("MOM_TPU_BENCH_PTS", 262_144))
    res = os.environ.get("MOM_TPU_BENCH_RES", "512")
    W, H = ([int(v) for v in res.split("x")] * 2)[:2]
    # keep the metric name honest under scale overrides (a 921k/720p run
    # must not ship labelled as the default 262k/512 problem)
    if N_PTS != 262_144 or (W, H) != (512, 512):
        _result["metric"] = (f"4dgs_fine_train_iters_per_sec_"
                             f"{W}x{H}_{N_PTS // 1000}k")
    state, deform_cfg, hidden, opt, packed, gts, W, H = build_problem(
        N_PTS, W, H)
    key_cap = default_key_cap(N_PTS, 4.0)
    log(f"problem built: {N_PTS} pts, key_cap={key_cap}")

    step = make_train_step(opt, hidden, deform_cfg, W, H, "fine",
                           spatial_lr_scale=3.0, bg=(0, 0, 0),
                           key_cap=key_cap, backend="tiled")

    # warmup/compile (the one essential compile)
    camb = {k: jnp.asarray(v[0:1]) for k, v in packed.items()}
    gtb = jnp.asarray(gts[0:1])
    tc = time.time()
    state, m = step(state, camb, gtb, jnp.asarray(1.0, jnp.float32),
                    jnp.asarray(3, jnp.int32))
    jax.block_until_ready(m["loss"])
    compile_s = time.time() - tc
    log(f"step compiled+first-run in {compile_s:.1f}s")

    oracle_ips, oracle_prov = _oracle_baseline(N_PTS, f"{W}x{H}")
    pf_fwd, pf_bwd = pallas_flops(key_cap, W, H)

    # measure in two batches and BANK the preliminary result after the
    # first, so a watchdog flush mid-run still ships a real value + an
    # analytic-only MFU (the Pallas composite dominates the step FLOPs)
    n_iters = int(os.environ.get("MOM_TPU_BENCH_ITERS", 30))
    n_pre = min(5, n_iters)
    ips_pre, state, m = time_chained(step, state, n_pre, packed, gts)
    _result.update(value=round(ips_pre, 3),
                   vs_baseline=round(ips_pre / oracle_ips, 3))
    _result["extra"] = {"status": "preliminary", "n_points": N_PTS,
                        "resolution": f"{W}x{H}",
                        "step_ms": round(1e3 / ips_pre, 1),
                        "mfu_vs_v5e_bf16_peak": round(
                            (pf_fwd + pf_bwd) * ips_pre / V5E_PEAK_BF16, 4),
                        "compile_s": round(compile_s, 1)}
    log(f"preliminary: {ips_pre:.3f} it/s over {n_pre} iters")
    if n_iters > n_pre:
        tiled_ips, state, m = time_chained(step, state, n_iters - n_pre,
                                           packed, gts)
    else:
        tiled_ips = ips_pre
    step_s = 1.0 / tiled_ips
    log(f"tiled: {tiled_ips:.3f} it/s over {n_iters - n_pre} chained iters")
    # bank the full tiled measurement before the scan compile (an alarm
    # during a slow multistep compile must still ship this number)
    _result.update(value=round(tiled_ips, 3),
                   vs_baseline=round(tiled_ips / oracle_ips, 3))
    _result["extra"]["status"] = "tiled"
    _result["extra"]["step_ms"] = round(step_s * 1e3, 1)

    # scan-batched path (the production training loop, make_chunked_steps):
    # K iterations per dispatched program — on a remote-tunnel device this
    # is the realizable training rate, free of per-dispatch round-trips
    scan_ips = None
    try:
        from mom_tpu.train.loop import make_chunked_steps
        # K=33 is the production loop's chunk (pipeline.py); tunable down
        # for CPU-interpret smoke runs of the harness itself
        K = int(os.environ.get("MOM_TPU_BENCH_SCAN_K", "33"))
        multistep, _ = make_chunked_steps(step, K)
        cams_dev = {k: jnp.asarray(v) for k, v in packed.items()}
        gts_dev = jnp.asarray(gts)
        vis = jnp.asarray(np.arange(K) % 4, jnp.int32)
        tc = time.time()
        state, losses = multistep(state, cams_dev, gts_dev, vis,
                                  jnp.asarray(100.0, jnp.float32),
                                  jnp.asarray(3, jnp.int32))
        jax.block_until_ready(losses)
        log(f"multistep compiled+first in {time.time() - tc:.1f}s")
        n_scans = max(2, int(os.environ.get("MOM_TPU_BENCH_SCANS", "3")))
        t0 = time.time()
        for s in range(n_scans):
            state, losses = multistep(state, cams_dev, gts_dev, vis,
                                      jnp.asarray(200.0 + s * K, jnp.float32),
                                      jnp.asarray(3, jnp.int32))
        jax.block_until_ready(losses)
        scan_ips = n_scans * K / (time.time() - t0)
        log(f"scan-batched: {scan_ips:.3f} it/s over {n_scans}x{K} iters")
    except Exception as e:                                    # noqa: BLE001
        log(f"scan path skipped: {e}")

    headline = max(tiled_ips, scan_ips or 0.0)
    step_s = 1.0 / headline

    # exact-graph FLOPs: .lower().compile() may MISS the in-process jit
    # cache on some backends and recompile, so this runs only after the
    # measurements are banked
    xla_flops = None
    try:
        lowered = step.lower(state, camb, gtb, jnp.asarray(2.0, jnp.float32),
                             jnp.asarray(3, jnp.int32))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        xla_flops = float(cost.get("flops", 0.0))
    except Exception as e:                                    # noqa: BLE001
        log(f"cost_analysis unavailable: {e}")
    total_flops = (xla_flops or 0.0) + pf_fwd + pf_bwd
    mfu = total_flops / step_s / V5E_PEAK_BF16

    _result.update(value=round(headline, 3),
                   vs_baseline=round(headline / oracle_ips, 3))
    _result["extra"] = {
        "status": "core",
        "n_points": N_PTS,
        "resolution": f"{W}x{H}",
        "single_step_iters_per_sec": round(tiled_ips, 3),
        "scan_batched_iters_per_sec": round(scan_ips, 3) if scan_ips else None,
        "capacity": int(state.gauss.capacity),
        "key_cap_instances": key_cap,
        "train_loss": float(m["loss"]),
        "train_psnr": float(m["psnr"]),
        "overflow": int(m["overflow"]),
        "mfu_vs_v5e_bf16_peak": round(mfu, 4),
        "flops_per_step": {"xla_cost_analysis": xla_flops,
                           "pallas_composite_fwd": pf_fwd,
                           "pallas_composite_bwd": pf_bwd},
        "step_ms": round(step_s * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "oracle_baseline": oracle_prov,
        "gt": "demo/scene_0 photo crops",
        "backend": jax.default_backend(),
    }
    if _active_gates():
        _result["extra"]["active_gates"] = _active_gates()

    # ---- best-effort step-time breakdown ------------------------------
    try:
        if time.time() - T0 < 0.55 * BUDGET:
            breakdown = _breakdown(state, deform_cfg, key_cap, W, H, camb)
            _result["extra"]["breakdown_ms"] = breakdown
            _result["extra"]["status"] = "core+breakdown"
    except Exception as e:                                    # noqa: BLE001
        log(f"breakdown skipped: {e}")
    _result["extra"]["elapsed_s"] = round(time.time() - T0, 1)
    signal.alarm(0)
    if jax.default_backend() != "cpu" and not _off_default_config():
        # seed the stale-fallback bank for wedged runs — but only in the
        # driver-official configuration (default scale AND no compute-path
        # gate envs), so A/B runs never overwrite the bank the driver's
        # own run would want
        _bank_result()
    _print_once()


def _breakdown(state, deform_cfg, key_cap, W, H, camb):
    """Phase timings of the render forward path.  Each phase runs as ONE
    jitted lax.scan of ``reps`` iterations with a genuine serial dependency
    (an output-derived scalar perturbs the next rep's input), so per-rep
    time is free of BOTH dispatch round-trips (a ~1s/dispatch tax through
    the remote tunnel that made round-2's phase numbers sum to less than
    the step) and XLA loop-invariant hoisting/elision."""
    import jax
    import jax.numpy as jnp
    from mom_tpu.ops import rasterize as R
    from mom_tpu.ops.preprocess import preprocess
    from mom_tpu.models import gaussians as G
    from mom_tpu.models import deformation as D

    params, aux = state.gauss.params, state.gauss.aux
    cam = {k: v[0] for k, v in camb.items()}
    out = {}

    def timeit(name, fn, *args, reps=10):
        def _perturb(tree, eps):
            # scale the first float leaf by (1 + eps): eps is a runtime
            # value, so XLA cannot fold the multiply or CSE across reps
            leaves, treedef = jax.tree.flatten(tree)
            done = False
            for i, leaf in enumerate(leaves):
                if (not done and hasattr(leaf, "dtype")
                        and jnp.issubdtype(leaf.dtype, jnp.floating)):
                    leaves[i] = leaf * (1.0 + eps)
                    done = True
            return jax.tree.unflatten(treedef, leaves)

        @jax.jit
        def scanned(args0):
            def body(eps, _):
                r = fn(*_perturb(args0, eps))
                # ANY-dtype leaf (int outputs count — an all-int phase like
                # binning would otherwise have a constant carry and the
                # whole body gets hoisted out of the loop)
                lf = [l for l in jax.tree.leaves(r) if hasattr(l, "dtype")]
                # |eps| <= 1e-12: numerically a no-op, but a real runtime
                # value — the dependency chain is unfoldable/unhoistable
                nxt = (jnp.tanh(jnp.nan_to_num(
                    jnp.sum(lf[0].astype(jnp.float32)))) * 1e-12
                       if lf else jnp.asarray(0.0, jnp.float32))
                return nxt, None
            eps, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                                  None, length=reps)
            return eps

        r = jax.jit(fn)(*args)            # result for downstream phases
        jax.block_until_ready(scanned(args))       # compile + warm
        t0 = time.time()
        jax.block_until_ready(scanned(args))
        out[name] = round((time.time() - t0) / reps * 1e3, 2)
        log(f"breakdown {name}: {out[name]} ms")
        return r

    scales, rots, opac = G.activated(params)

    def do_deform(p):
        t = jnp.full((p.xyz.shape[0],), 0.5)
        return D.deform(state.deform, deform_cfg, p.xyz, p.scaling,
                        p.rotation, p.opacity, G.get_features(p), t,
                        aux.scene_flow, jnp.asarray(1.0), 1.0,
                        uniform_time=True)

    try:
        timeit("deform_hexplane", do_deform, params)
    except Exception as e:                                    # noqa: BLE001
        log(f"deform breakdown n/a: {e}")

    def do_pre(p):
        return preprocess(p.xyz, scales, rots, jax.nn.sigmoid(p.opacity)[:, 0],
                          G.get_features(p), cam["viewmatrix"],
                          cam["projmatrix"], cam["campos"],
                          cam["tanfovx"], cam["tanfovy"], W, H,
                          alive_mask=aux.alive)

    pre = timeit("preprocess", do_pre, params)

    binning = timeit("bin", lambda pr: R.bin_gaussians(pr, W, H, key_cap),
                     pre)
    timeit("pack+composite_fwd",
           lambda pr, b: R._composite(
               R._pack_features(pr, b, key_cap), b.chunk_tile,
               b.tile_starts, b.tile_ends, b.slot_valid, W, H),
           pre, binning)

    # full forward render (deform+preprocess+bin+pack+composite); the
    # step-minus-forward difference is the backward+Adam share
    from mom_tpu.render import render as render_fn
    timeit("render_fwd",
           lambda p: render_fn(p, aux, state.deform, deform_cfg, cam, W, H,
                               jnp.zeros(3), stage="fine",
                               active_sh_degree=3, delta_scale=1.0,
                               key_cap=key_cap, backend="tiled").color,
           params)

    # deform fwd+bwd w.r.t. the DEFORMATION tree: isolates the
    # hexplane-gather VJP (a scatter-add into the plane tables) from the
    # rasterizer backward
    def deform_loss(dtree):
        t = jnp.full((params.xyz.shape[0],), 0.5)
        out = D.deform(dtree, deform_cfg, params.xyz, params.scaling,
                       params.rotation, params.opacity,
                       G.get_features(params), t, aux.scene_flow,
                       jnp.asarray(1.0), 1.0, uniform_time=True)
        return sum(jnp.sum(o * o) for o in out[:3])

    try:
        timeit("deform_fwd+bwd",
               lambda d: jax.grad(deform_loss)(d)["grid"]["grids"][0][0],
               state.deform)
    except Exception as e:                                    # noqa: BLE001
        log(f"deform grad breakdown n/a: {e}")

    # composite-only and pack+composite fwd+bwd (the Pallas backward kernel
    # and the _expand_rows segment-sum VJP, isolated)
    feat = R._pack_features(pre, binning, key_cap)

    def comp_loss(f):
        acc, logt = R._composite(f, binning.chunk_tile, binning.tile_starts,
                                 binning.tile_ends, binning.slot_valid, W, H)
        return jnp.sum(acc * acc) + jnp.sum(logt)

    timeit("composite_fwd+bwd", lambda f: jax.grad(comp_loss)(f), feat)

    def packcomp_loss(pr):
        f = R._pack_features(pr, binning, key_cap)
        acc, logt = R._composite(f, binning.chunk_tile, binning.tile_starts,
                                 binning.tile_ends, binning.slot_valid, W, H)
        return jnp.sum(acc * acc) + jnp.sum(logt)

    timeit("pack+composite_fwd+bwd",
           lambda pr: jax.grad(packcomp_loss, allow_int=True)(pr).means2d,
           pre)

    # full render + L1, fwd+bwd w.r.t. params (= loss.backward without
    # Adam/stats)
    def render_loss(p):
        col = render_fn(p, aux, state.deform, deform_cfg, cam, W, H,
                        jnp.zeros(3), stage="fine", active_sh_degree=3,
                        delta_scale=1.0, key_cap=key_cap,
                        backend="tiled").color
        return jnp.mean(jnp.abs(col - 0.5))

    timeit("render+l1_fwd+bwd",
           lambda p: jax.grad(render_loss)(p).xyz, params)

    # SSIM term alone (11x11 window conv fwd+bwd on the full image) and the
    # Adam apply: the two step components outside the render graph
    from mom_tpu.train import losses as L
    img = jnp.linspace(0, 1, H * W * 3, dtype=jnp.float32).reshape(1, H, W, 3)

    def ssim_loss(x):
        return 1.0 - L.ssim(x, img * 0.9)

    timeit("ssim_fwd+bwd", lambda x: jax.grad(ssim_loss)(x), img)

    from mom_tpu.train import optim as O
    try:
        gtree = {"xyz": params.xyz, "f_dc": G.get_features(params)}
        m0 = O.init_adam(gtree)
        grads = jax.tree.map(jnp.ones_like, gtree)
        lrs = {"xyz": 1e-3, "f_dc": 1e-3}
        timeit("adam_xyz+feat",
               lambda g: O.adam_step(gtree, g, m0, lrs)[0]["xyz"], grads)
    except Exception as e:                                    # noqa: BLE001
        log(f"adam probe n/a: {e}")
    return out


if __name__ == "__main__":
    main()
