#!/usr/bin/env python
"""Stage-1 CLI: motion estimation + multi-view synthesis.

Flag-compatible with the reference train_motion.py:426-464: reads
``<input_dir>/image.png``, ``image_json/mask.png`` and labelme hints from
``image.json``; writes MOM/train_data.pth, MOM/scene_flow.pth, MOM/video/
frames + mp4 and MOM/Flow_viz/.
"""

import os
import sys
from argparse import ArgumentParser


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    parser.add_argument("--input_dir", type=str, required=True,
                        help="input folder that contains src images")
    parser.add_argument("--train_iteration", type=int, default=200)
    parser.add_argument("-c", "--config", type=str,
                        default="thirdparty/cinemagraphy/config.yaml")
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument("--distributed", action="store_true")
    parser.add_argument("--cinema_ckpt", type=str, default="ckpts")
    parser.add_argument("--no_reload", action="store_true")
    parser.add_argument("--no_load_opt", action="store_true")
    parser.add_argument("--no_load_scheduler", action="store_true")
    parser.add_argument("--n_frames", type=int, default=120,
                        help="looping video length (StyleCineGAN option.py:35)")
    parser.add_argument("--depth_backend", type=str, default="auto")
    parser.add_argument("--flow_backend", type=str, default="auto",
                        help="auto|spade|hints — auto uses the SPADE-UNet "
                             "port when sceneflow_model.pth exists")
    parser.add_argument("--video_backend", type=str, default="auto",
                        help="auto|stylegan|pixel — auto uses the StyleGAN2 "
                             "feature-warping port when sg2-lhq-1024.pt "
                             "exists")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    import numpy as np
    import torch
    from PIL import Image
    from mom_tpu.motion.pipeline import (MotionOptimization, read_hints_json,
                                         save_video_frames, viz_flow_dir)
    from mom_tpu.motion.video import generate_loop_frames

    mom_dir = os.path.join(args.input_dir, "MOM")
    os.makedirs(mom_dir, exist_ok=True)

    src_img = Image.open(os.path.join(args.input_dir, "image.png"))
    src_mask = Image.open(os.path.join(args.input_dir, "image_json",
                                       "mask.png"))
    hints = read_hints_json(os.path.join(args.input_dir, "image.json"))

    flow_ckpt = os.path.join(args.cinema_ckpt, "sceneflow_model.pth")
    depth_ckpt = os.path.join(args.cinema_ckpt, "ZoeD_M12_N.pt")
    mom = MotionOptimization(
        src_img, depth_backend=args.depth_backend,
        flow_backend=args.flow_backend,
        depth_ckpt=depth_ckpt if os.path.exists(depth_ckpt) else None,
        flow_ckpt=flow_ckpt if os.path.exists(flow_ckpt) else None)
    mask_arr = np.asarray(src_mask.convert("L"))
    train_data, none_idx = mom.render_pcd(mask_arr, hints)
    print(f"rendered {len(train_data['frames'])} views "
          f"({len(none_idx)} culled)")
    train_data = mom.estimate_flow(train_data)
    train_data, scene_flow = mom.optimize_motion(train_data, none_idx,
                                                 args.train_iteration)
    # the reference writes this duplicate first (train_motion.py:454)
    torch.save(train_data, os.path.join(mom_dir, "tran_data.pth"))

    # looping cinemagraph from the center view + its optimized dense flow
    # (main_jih.py:27-40 uses frames[center]['our_flow'])
    src_rgb = np.asarray(src_img.convert("RGB"), np.float32) / 255.0
    center = train_data["frames"][2]
    flow_key = "our_flow" if center.get("our_flow") else "T2C_flow"
    center_flow = np.asarray(center[flow_key][0])[0].transpose(1, 2, 0)
    fluid_mask = (mask_arr > 0).astype(np.float32)
    sg2_ckpt = os.path.join(args.cinema_ckpt,
                            "stylegan2-pytorch", "sg2-lhq-1024.pt")
    enc_ckpt = os.path.join(args.cinema_ckpt, "fs_encoder.pth")
    frames = generate_loop_frames(src_rgb, center_flow, fluid_mask,
                                  n_frames=args.n_frames,
                                  backend=args.video_backend,
                                  sg2_ckpt=sg2_ckpt, encoder_ckpt=enc_ckpt)
    save_video_frames(frames, mom_dir, mom.W, mom.H)

    viz_flow_dir(train_data, os.path.join(mom_dir, "Flow_viz"))

    torch.save(train_data, os.path.join(mom_dir, "train_data.pth"))
    torch.save(torch.tensor(np.asarray(scene_flow)),
               os.path.join(mom_dir, "scene_flow.pth"))
    print("Stage 1 complete.")


if __name__ == "__main__":
    main()
