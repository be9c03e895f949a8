#!/usr/bin/env python
"""Stage-3 CLI: render the four camera trajectories from a trained model.

Flag-compatible with the reference render_4DGS.py:93-121: loads the
max-iteration point_cloud/iteration_N artifacts under <input_dir> and writes
frame_result/ PNGs + vid_result/ mp4s, printing FPS per trajectory.
"""

import os
import sys
from argparse import ArgumentParser


def main(argv=None):
    parser = ArgumentParser(description="Testing script parameters")
    from mom_tpu import config as C
    C.add_group_args(parser, C.ModelParams, "Loading Parameters")
    C.add_group_args(parser, C.PipelineParams, "Pipeline Parameters")
    C.add_group_args(parser, C.ModelHiddenParams, "ModelHiddenParams")
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--skip_video", action="store_true")
    parser.add_argument("--configs", default="arguments/dnerf/hellwarrior.py",
                        type=str)
    parser.add_argument("--input_dir", type=str, required=True)
    parser.add_argument("--backend", type=str, default="tiled",
                        choices=["tiled", "reference"])
    parser.add_argument("--trajectory_dir", type=str,
                        default="test_trajectory")

    args = C.get_combined_args(parser, argv if argv is not None
                               else sys.argv[1:])
    if args.configs and os.path.exists(args.configs):
        cfg = C.load_config_file(args.configs)
        args = C.merge_hparams(args, cfg)
    model_cfg = C.extract_group(args, C.ModelParams)
    hidden_cfg = C.extract_group(args, C.ModelHiddenParams)
    print("Rendering", args.input_dir)

    mom_dir = os.path.join(args.input_dir, "MOM")
    train_data_path = os.path.join(mom_dir, "train_data.pth")
    gaussian_path = args.input_dir

    import jax
    from mom_tpu.data.scene import load_scene
    from mom_tpu.data import checkpoints as ckpt
    from mom_tpu.models import deformation as D
    from mom_tpu.train import optim
    from mom_tpu.train.loop import TrainState, _params_by_group
    from mom_tpu.utils.system import search_for_max_iteration
    from mom_tpu import pipeline

    scene = load_scene(train_data_path,
                       white_background=model_cfg.white_background,
                       traj_dir=getattr(args, "trajectory_dir",
                                        "test_trajectory"))

    iteration = args.iteration
    pc_root = os.path.join(gaussian_path, "point_cloud")
    if iteration == -1:
        iteration = search_for_max_iteration(pc_root)
    print(f"Loading trained model at iteration {iteration}")
    pc_dir = os.path.join(pc_root, f"iteration_{iteration}")

    deform_cfg = pipeline.deform_config_from_hidden(hidden_cfg)
    template = D.init_deformation(jax.random.PRNGKey(0), deform_cfg)
    from mom_tpu.data.ply import read_ply_vertices
    n_pts = len(read_ply_vertices(os.path.join(pc_dir, "point_cloud.ply")))
    capacity = ((n_pts + 1023) // 1024) * 1024
    gauss, deform = ckpt.load_point_cloud_dir(pc_dir, capacity, template)
    print("point nums:", n_pts)

    groups = _params_by_group(gauss.params, deform)
    state = TrainState(gauss=gauss, deform=deform,
                       adam=optim.init_adam(groups),
                       rng=jax.random.PRNGKey(0))

    bg = (1, 1, 1) if model_cfg.white_background else (0, 0, 0)
    fps, health = pipeline.render_sets(gaussian_path, state, deform_cfg,
                                       scene, bg=bg, backend=args.backend)
    return fps


if __name__ == "__main__":
    main()
