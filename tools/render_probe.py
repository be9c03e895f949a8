#!/usr/bin/env python
"""Per-view render diagnostics + artifact health gate for a banked checkpoint.

Round-4 postmortem (VERDICT.md Weak #1): the offline full-res TPU eval/export
shipped frames with the entire far field black (PSNR 13.1) from a checkpoint
that renders correctly on CPU — and nothing between "render ran" and
"artifact committed" checked. This tool is that check. For each probed view
it prints overflow, surviving instance count, mean brightness, final_T
coverage and PSNR vs GT, and (with --gate) FAILS LOUDLY unless every view
passes sanity thresholds. eval/export wrappers run it before anything is
committed (reference output semantics: render_4DGS.py:50-76).

Usage:
  python tools/render_probe.py --input_dir demo/scene_0 \
      [--checkpoint ...] [--views 0 6 12] [--scale 1] [--key_cap_mult 4] \
      [--gate] [--json out.json]

Run with JAX_PLATFORMS=cpu and --scale 4 for the CPU-oracle cross-check
(~2 min); run on the TPU at --scale 1 for the full-res probe.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--allow_reset_boundary", action="store_true")
    ap.add_argument("--views", type=int, nargs="+", default=[0, 6, 12])
    ap.add_argument("--scale", type=int, default=1,
                    help="downscale factor (4 -> 320x180 on 1280x720)")
    ap.add_argument("--key_cap_mult", type=float, default=4.0)
    ap.add_argument("--backend", default="tiled",
                    choices=["tiled", "oracle"])
    ap.add_argument("--gate", action="store_true",
                    help="exit 1 unless all views pass the health bar")
    ap.add_argument("--min_psnr", type=float, default=18.0)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ckpt_select import pick_checkpoint
    from offline_common import load_offline_state
    ckpt_path = pick_checkpoint(args.input_dir, args.checkpoint,
                                args.allow_reset_boundary)
    assert ckpt_path, "no checkpoint found"

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from mom_tpu import pipeline
    from mom_tpu.render import render as render_fn
    from mom_tpu.ops.rasterize import CHUNK
    from mom_tpu.train import losses as L

    scene, state, deform_cfg, stage, iteration, extra = load_offline_state(
        args.input_dir, ckpt_path)

    W = scene.width // args.scale
    H = scene.height // args.scale
    bg = jnp.zeros(3, jnp.float32)
    n0 = int(np.asarray(state.gauss.aux.alive).sum())
    key_cap = ((int(n0 * args.key_cap_mult) + CHUNK - 1) // CHUNK) * CHUNK
    print(f"probe {os.path.basename(ckpt_path)} stage={stage} "
          f"iter={iteration} alive={n0} key_cap={key_cap} "
          f"res={W}x{H} backend={args.backend} "
          f"jax_backend={jax.default_backend()}", flush=True)

    test_cams = scene.test_cams
    gts = pipeline._gt_stack(test_cams)   # (N,H,W,3) uint8 at full res

    @jax.jit
    def probe_one(params, aux, deform, cam):
        out = render_fn(params, aux, deform, deform_cfg, cam, W, H, bg,
                        stage=stage, active_sh_degree=3, delta_scale=1.0,
                        key_cap=key_cap, backend=args.backend)
        img = jnp.clip(out.color, 0.0, 1.0)
        return (img, out.overflow, out.instances,
                jnp.mean(out.final_T),
                jnp.mean((out.final_T > 0.5).astype(jnp.float32)))

    views = []
    ok = True
    for vi in args.views:
        cam = test_cams[vi]
        camj = {k: jnp.asarray(v) for k, v in cam.pack().items()}
        img, ovf, inst, ft_mean, ft_open = probe_one(
            state.gauss.params, state.gauss.aux, state.deform, camj)
        img = np.asarray(img)
        gt = gts[vi].astype(np.float32) / 255.0
        if args.scale > 1:   # box-downsample GT to the probe resolution
            s = args.scale
            gt = gt[:H * s, :W * s].reshape(H, s, W, s, 3).mean(axis=(1, 3))
        psnr = float(L.psnr(jnp.asarray(img), jnp.asarray(gt)))
        rec = {"view": vi,
               "overflow": int(ovf), "instances": int(inst),
               "mean_brightness": float(img.mean() * 255.0),
               "gt_mean_brightness": float(gt.mean() * 255.0),
               "final_T_mean": float(ft_mean),
               "final_T_open_frac": float(ft_open),
               "psnr": psnr}
        # health bar: no overflow, PSNR floor, brightness within 2x of GT
        rec["healthy"] = bool(
            rec["overflow"] == 0
            and psnr >= args.min_psnr
            and rec["mean_brightness"] > 0.5 * rec["gt_mean_brightness"]
            and rec["mean_brightness"] < 2.0 * rec["gt_mean_brightness"])
        ok = ok and rec["healthy"]
        print(json.dumps(rec), flush=True)
        views.append(rec)

    result = {"checkpoint": os.path.basename(ckpt_path),
              "stage": stage, "iteration": iteration,
              "backend": args.backend, "scale": args.scale,
              "jax_backend": jax.default_backend(),
              "key_cap": key_cap, "views": views, "healthy": ok}
    print(json.dumps({"healthy": ok,
                      "mean_psnr": float(np.mean([v["psnr"]
                                                  for v in views]))}),
          flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f)
    if args.gate and not ok:
        print("HEALTH GATE FAILED", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException:
        import traceback
        traceback.print_exc()
        sys.stdout.flush()
        os._exit(3)
