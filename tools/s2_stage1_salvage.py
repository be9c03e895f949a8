#!/usr/bin/env python
"""Finish scene_2's stage 1 ON CPU from the banked MOM/tran_data.pth.

The TPU run wedged the tunnel twice at the exact same point (the
pixel-warp video phase); everything before it — depth, PCD views, 2D
flow — is already inside tran_data.pth (train_motion.py writes that
duplicate first, matching the reference's early save at
train_motion.py:454).  This tool replays the REMAINING steps of
train_motion.py main() (scene-flow optimization, cinemagraph video,
Flow_viz, final saves) with JAX forced to CPU, so no tunnel is touched.

Usage: python tools/s2_stage1_salvage.py --input_dir demo/scene_2
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--train_iteration", type=int, default=200)
    ap.add_argument("--n_frames", type=int, default=60)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.devices()

    import numpy as np
    import torch
    from PIL import Image
    from mom_tpu.motion.pipeline import (MotionOptimization,
                                         save_video_frames, viz_flow_dir)
    from mom_tpu.motion.video import generate_loop_frames

    mom_dir = os.path.join(args.input_dir, "MOM")
    train_data = torch.load(os.path.join(mom_dir, "tran_data.pth"),
                            map_location="cpu", weights_only=False)
    print(f"banked tran_data: {len(train_data['frames'])} frames "
          f"{train_data['W']}x{train_data['H']}", flush=True)

    src_img = Image.open(os.path.join(args.input_dir, "image.png"))
    src_mask = Image.open(os.path.join(args.input_dir, "image_json",
                                       "mask.png"))
    # rebuild the pose/camera state (deterministic trajectory seeds +
    # weight-free depth prior — same backends the wedged run used)
    mom = MotionOptimization(src_img)
    mask_arr = np.asarray(src_mask.convert("L"))

    # the wedged run already appended our_flow once; reset so
    # optimize_motion's append leaves exactly one entry per frame
    for fr in train_data["frames"]:
        fr["our_flow"] = []
    train_data, scene_flow = mom.optimize_motion(train_data, [],
                                                 args.train_iteration)

    torch.save(train_data, os.path.join(mom_dir, "tran_data.pth"))

    src_rgb = np.asarray(src_img.convert("RGB"), np.float32) / 255.0
    center = train_data["frames"][2]
    flow_key = "our_flow" if center.get("our_flow") else "T2C_flow"
    center_flow = np.asarray(center[flow_key][0])[0].transpose(1, 2, 0)
    fluid_mask = (mask_arr > 0).astype(np.float32)
    frames = generate_loop_frames(src_rgb, center_flow, fluid_mask,
                                  n_frames=args.n_frames)
    save_video_frames(frames, mom_dir, mom.W, mom.H)
    viz_flow_dir(train_data, os.path.join(mom_dir, "Flow_viz"))

    torch.save(train_data, os.path.join(mom_dir, "train_data.pth"))
    torch.save(torch.tensor(np.asarray(scene_flow)),
               os.path.join(mom_dir, "scene_flow.pth"))
    print("Stage 1 salvage complete.", flush=True)


if __name__ == "__main__":
    main()
