#!/usr/bin/env python
"""Export inference artifacts + stage-3 renders from a training checkpoint.

Given a chkpnt_{stage}_{iter}.npz produced by train_4DGS.py, writes the
reference-layout artifacts (point_cloud/iteration_N/* with PLY +
deformation.pth + scene_flow.pth) and optionally renders the four test
trajectories (render_4DGS semantics) — a salvage/export path that does not
require re-entering the training loop.

Usage:
  python tools/export_from_checkpoint.py --input_dir demo/scene_0 \
      [--checkpoint demo/scene_0/chkpnt_fine_8000.npz] [--render] \
      [--expname full_r2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="defaults to the newest NON-reset-boundary "
                         "chkpnt_*_*.npz in input_dir")
    ap.add_argument("--allow_reset_boundary", action="store_true",
                    help="export a post-opacity-reset checkpoint anyway")
    ap.add_argument("--render", action="store_true")
    ap.add_argument("--expname", default="full_r2")
    ap.add_argument("--key_cap_mult", type=float, default=0.0,
                    help="0 (default) = size each trajectory's key_cap from "
                         "a measured demand scan (pipeline.render_sets); "
                         ">0 = legacy blanket alive*mult cap")
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
    from mom_tpu.data import checkpoints as ckpt_io
    from mom_tpu import pipeline

    scene, state, deform_cfg, stage, iteration, extra = load_offline_state(
        args.input_dir, ckpt_path)
    print(f"exporting from {ckpt_path} (stage={stage}, iter={iteration})")

    out_dir = os.path.join(args.input_dir, "point_cloud",
                           f"iteration_{iteration}")
    ckpt_io.save_point_cloud_dir(out_dir, state.gauss, state.deform,
                                 deform_cfg)
    print(f"wrote {out_dir}")

    if args.render:
        key_cap = None
        if args.key_cap_mult > 0:
            from mom_tpu.ops.rasterize import CHUNK
            n0 = int(np.asarray(state.gauss.aux.alive).sum())
            key_cap = ((int(n0 * args.key_cap_mult) + CHUNK - 1)
                       // CHUNK) * CHUNK
        fps, health = pipeline.render_sets(args.input_dir, state, deform_cfg,
                                           scene, key_cap=key_cap)
        print("FPS per trajectory:", fps)
        print("HEALTH per trajectory:", json.dumps(health))
        bad = {k: h for k, h in health.items()
               if h["frames_overflowed"] > 0 or h["mean_brightness"] < 8.0}
        if bad:
            # rc!=0 so orchestration scripts refuse to commit these frames
            print("EXPORT HEALTH GATE FAILED:", json.dumps(bad))
            sys.exit(1)


if __name__ == "__main__":
    try:
        main()
    except BaseException:
        import traceback
        traceback.print_exc()
        sys.stdout.flush()
        os._exit(3)
