#!/usr/bin/env python
"""Render-compute FPS probe for a banked checkpoint: times one (or every)
trajectory through the scan-batched stage-3 render path WITHOUT writing any
PNG/mp4 — isolates render compute + dispatch from host file IO.

The reference prints warm FPS per trajectory (render_4DGS.py:61-71); this
tool is the A/B harness for render-path experiments (e.g. the banded
grouping sort, MOM_TPU_RENDER_BANDS=N — ops/rasterize.py:_rasterize_banded).

Usage:
  MOM_TPU_RENDER_BANDS=4 python tools/fps_probe.py --input_dir demo/scene_0 \
      [--checkpoint ...] [--traj up_down] [--json out.json]
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
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--allow_reset_boundary", action="store_true")
    ap.add_argument("--traj", default=None,
                    help="single trajectory name (up-down/side/zoom-in/"
                         "circle); default all four")
    ap.add_argument("--frames", type=int, default=0,
                    help="probe only the first N frames (0 = full 60-frame "
                         "trajectory; small N for CPU-interpret smoke runs)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # no keepalive dispatches inside the timed FPS windows (review finding)
    os.environ.setdefault("MOM_TPU_NO_STREAM_WARM", "1")
    from ckpt_select import pick_checkpoint
    from offline_common import load_offline_state

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from mom_tpu import pipeline

    ckpt = pick_checkpoint(args.input_dir, args.checkpoint,
                           args.allow_reset_boundary)
    scene, state, deform_cfg, stage, iteration, _ = load_offline_state(
        args.input_dir, ckpt)
    from mom_tpu.ops.rasterize import TILE
    bands = int(os.environ.get("MOM_TPU_RENDER_BANDS", "1") or 1)
    bands = max(1, min(bands, (scene.height + TILE - 1) // TILE))
    print(f"fps probe: {ckpt} (stage={stage}, iter={iteration}) "
          f"bands={bands}", flush=True)

    import numpy as np
    import jax.numpy as jnp
    ds = pipeline.make_demand_scan(deform_cfg, scene.width, scene.height,
                                   stage=stage, bands=bands)

    def cap_for(cams):
        packed = {k: jnp.asarray(v)
                  for k, v in pipeline.pack_cameras(cams).items()}
        d = np.asarray(ds(state.gauss.params, state.gauss.aux, state.deform,
                          packed))
        if bands > 1:
            return tuple(pipeline.size_key_cap(int(d[:, b].max()))
                         for b in range(bands))
        return pipeline.size_key_cap(int(d.max()))

    bg = (0, 0, 0)
    rs_cache = {}

    def rs_for(cap):
        if cap not in rs_cache:
            rs_cache[cap] = pipeline.make_render_scan(
                deform_cfg, scene.width, scene.height, bg, stage=stage,
                key_cap=cap, with_stats=True)
        return rs_cache[cap]

    result = {"checkpoint": os.path.basename(ckpt), "bands": bands,
              "resolution": f"{scene.width}x{scene.height}", "fps": {},
              "health": {}}
    for name, cams in scene.video_cams.items():
        if args.traj and name != args.traj:
            continue
        stats = {}
        if args.frames:
            cams = cams[:args.frames]
        cap = cap_for(cams)
        print(f"{name}: cap={cap}", flush=True)
        _, fps = pipeline.render_trajectory(
            state, deform_cfg, cams, scene.width, scene.height, bg,
            rs=rs_for(cap), stats=stats)
        h = {"max_overflow": int(stats["overflow"].max()),
             "max_instances": int(stats["instances"].max()),
             "mean_brightness": stats["mean_brightness"]}
        result["fps"][name] = round(fps, 3)
        result["health"][name] = h
        print(f"{name}: {fps:.3f} FPS  {h}", flush=True)
    print(json.dumps(result), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    try:
        main()
    except BaseException:
        import traceback
        traceback.print_exc()
        sys.stdout.flush()
        os._exit(3)
