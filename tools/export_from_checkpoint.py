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
    ap.add_argument("--key_cap_mult", type=float, default=4.0)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ckpt_select import pick_checkpoint
    ckpt_path = pick_checkpoint(args.input_dir, args.checkpoint,
                                args.allow_reset_boundary)
    assert ckpt_path, "no checkpoint found"
    import re
    m = re.match(r"chkpnt_(coarse|fine)_(\d+)\.npz",
                 os.path.basename(ckpt_path))
    stage, iteration = m.group(1), int(m.group(2))
    print(f"exporting from {ckpt_path} (stage={stage}, iter={iteration})")

    import numpy as np
    import jax
    from mom_tpu import config as C
    from mom_tpu.data.scene import load_scene
    from mom_tpu.data import checkpoints as ckpt_io
    from mom_tpu import pipeline

    opt_cfg = C.OptimizationParams()
    hidden = C.ModelHiddenParams()
    cfg_file = "./arguments/dnerf/hellwarrior.py"
    if os.path.exists(cfg_file):
        from argparse import Namespace
        ns = Namespace(**{**vars(C.OptimizationParams()),
                          **vars(C.ModelHiddenParams())})
        ns = C.merge_hparams(ns, C.load_config_file(cfg_file))
        for k in vars(opt_cfg):
            setattr(opt_cfg, k, getattr(ns, k, getattr(opt_cfg, k)))
        for k in vars(hidden):
            setattr(hidden, k, getattr(ns, k, getattr(hidden, k)))

    mom_dir = os.path.join(args.input_dir, "MOM")
    scene = load_scene(os.path.join(mom_dir, "train_data.pth"),
                       traj_dir="test_trajectory")
    state, deform_cfg, capacity = pipeline.build_initial_state(
        scene, hidden, opt_cfg, flow_scale=2.0)
    host_state, extra = ckpt_io.load_train_state(ckpt_path, state)
    ckpt_io.free_device_tree(state)
    state = host_state

    out_dir = os.path.join(args.input_dir, "point_cloud",
                           f"iteration_{iteration}")
    ckpt_io.save_point_cloud_dir(out_dir, state.gauss, state.deform,
                                 deform_cfg)
    print(f"wrote {out_dir}")

    if args.render:
        from mom_tpu.ops.rasterize import CHUNK
        n0 = int(np.asarray(state.gauss.aux.alive).sum())
        key_cap = ((int(n0 * args.key_cap_mult) + CHUNK - 1)
                   // CHUNK) * CHUNK
        fps = pipeline.render_sets(args.input_dir, state, deform_cfg, scene,
                                   key_cap=key_cap)
        print("FPS per trajectory:", fps)


if __name__ == "__main__":
    try:
        main()
    except BaseException:
        import traceback
        traceback.print_exc()
        sys.stdout.flush()
        os._exit(3)
