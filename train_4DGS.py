#!/usr/bin/env python
"""Stage-2 CLI: two-stage 4D Gaussian-Splatting optimization.

Flag-compatible with the reference train_4DGS.py (reference
train_4DGS.py:411-455): reads ``<input_dir>/MOM/train_data.pth`` (+
scene_flow.pth and MOM/video/), writes cfg_args, point_cloud/iteration_N/
artifacts, training videos and checkpoints under <input_dir>.
"""

import os
import random
import sys
from argparse import ArgumentParser, Namespace

import numpy as np


def setup_seed(seed):
    np.random.seed(seed)
    random.seed(seed)


def _start_device_keepalive(period_s: float = 20.0):
    """Tiny periodic device op on a daemon thread.  This machine's
    remote-TPU tunnel can silently drop an RPC stream that goes quiet for
    many minutes (e.g. during a long XLA compile), wedging the next device
    call forever; a trickle of no-op traffic keeps the stream alive."""
    import threading
    import jax
    import jax.numpy as jnp

    def beat():
        while True:
            try:
                jnp.zeros(8).sum().block_until_ready()
            except Exception:
                pass
            import time as _t
            _t.sleep(period_s)

    threading.Thread(target=beat, daemon=True,
                     name="device-keepalive").start()


def resolve_key_cap(n_alive: int, mult: float, extra: dict | None):
    """(key_cap, restored_from_checkpoint).

    The CHUNK-aligned cap is ``n_alive * mult``, but a resume must never
    shrink the instance budget below what the run had established in the
    checkpoint's extras: a watchdog restart right after the fine-8000
    prune recomputed alive*4 = 573k against ~1.2M of real demand, 50-87%
    of instances were depth-dropped, and PSNR fell 43 -> 19 for the rest
    of the run (runlogs/full_r4.log launch 1).  The in-loop
    _KeyCapController can shrink an oversized cap back gradually.
    """
    from mom_tpu.ops.rasterize import CHUNK
    key_cap = ((int(n_alive * mult) + CHUNK - 1) // CHUNK) * CHUNK
    ckpt_cap = int((extra or {}).get("key_cap", 0))
    if ckpt_cap > key_cap:
        return ckpt_cap, True
    return key_cap, False


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    setup_seed(6666)

    from mom_tpu import config as C
    C.add_group_args(parser, C.ModelParams, "Loading Parameters")
    C.add_group_args(parser, C.OptimizationParams, "Optimization Parameters")
    C.add_group_args(parser, C.PipelineParams, "Pipeline Parameters")
    C.add_group_args(parser, C.ModelHiddenParams, "ModelHiddenParams")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[3000, 7000, 14000])
    parser.add_argument("--video_iterations", nargs="+", type=int,
                        default=[14000, 20000, 25000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[14000, 20000, 25000, 30_000, 35000, 40000,
                                 50000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--expname", type=str, default="dnerf/hellwarrior")
    parser.add_argument("--configs", type=str,
                        default="./arguments/dnerf/hellwarrior.py")
    parser.add_argument("--input_dir", type=str, required=True,
                        help="input folder that contains src images")
    parser.add_argument("--flow_scale", type=float, default=2,
                        help="flow scale difference to Gaussians")
    parser.add_argument("--viewcrafter", action="store_true")
    parser.add_argument("--backend", type=str, default="tiled",
                        choices=["tiled", "reference"])
    parser.add_argument("--key_cap_mult", type=float, default=4.0,
                        help="instance-buffer headroom as a multiple of the "
                             "initial point count (overflow is logged)")
    parser.add_argument("--no_compact_resume", action="store_true",
                        help="disable capacity re-basing on resume (keep "
                             "the checkpoint's full buffer capacity)")
    parser.add_argument("--trajectory_dir", type=str,
                        default="test_trajectory")

    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    args.save_iterations.append(args.iterations)
    if args.configs and os.path.exists(args.configs):
        cfg = C.load_config_file(args.configs)
        args = C.merge_hparams(args, cfg)

    model_cfg = C.extract_group(args, C.ModelParams)
    opt_cfg = C.extract_group(args, C.OptimizationParams)
    hidden_cfg = C.extract_group(args, C.ModelHiddenParams)

    mom_dir = os.path.join(args.input_dir, "MOM")
    train_data_path = os.path.join(mom_dir, "train_data.pth")
    gaussian_path = args.input_dir
    print("Optimizing " + gaussian_path)
    _start_device_keepalive()

    from mom_tpu.config import save_cfg_args
    save_cfg_args(gaussian_path, Namespace(**vars(args)))

    from mom_tpu.data.scene import load_scene
    from mom_tpu.data import checkpoints as ckpt_io
    from mom_tpu import pipeline
    from mom_tpu.train.report import MetricsLogger
    from mom_tpu.utils.timer import Timer

    scene = load_scene(train_data_path,
                       white_background=model_cfg.white_background,
                       traj_dir=args.trajectory_dir)
    state, deform_cfg, capacity = pipeline.build_initial_state(
        scene, hidden_cfg, opt_cfg, args.flow_scale)

    # live SIBR-protocol viewer (gaussian_renderer/network_gui.py)
    gui = None
    try:
        from mom_tpu.viewer import NetworkGUI
        gui = NetworkGUI(args.ip, args.port)
    except OSError as e:
        print(f"network viewer disabled: {e}")

    logger = MetricsLogger(gaussian_path)
    bg = (1, 1, 1) if model_cfg.white_background else (0, 0, 0)
    timer = Timer()
    timer.start()

    # resume from a full-state checkpoint (reference stage-skip semantics,
    # train_4DGS.py:56-64)
    start_ckpt = args.start_checkpoint
    skip_coarse = False
    resume_state = None
    if start_ckpt:
        if "coarse" not in os.path.basename(start_ckpt):
            skip_coarse = True
        resume_state, extra = ckpt_io.load_train_state(start_ckpt, state)
        # the template's device buffers are dead weight once the resume
        # state (host leaves) exists — free them before training uploads it,
        # and swap the resume state in NOW (everything below, including the
        # key_cap num_alive read, must see live buffers)
        ckpt_io.free_device_tree(state)
        state = resume_state
        print(f"resuming from {start_ckpt} "
              f"(iteration {int(extra.get('iteration', -1))})", flush=True)
        if not args.no_compact_resume:
            # re-base the point capacity on the checkpoint's alive count
            # (big prunes leave the fixed-capacity buffers ~90% dead; see
            # compact_train_state).  All jitted programs compile at the new
            # static shapes below.
            old_cap = int(state.gauss.capacity)
            state, did = ckpt_io.compact_train_state(state)
            if did:
                print(f"compacted capacity {old_cap} -> "
                      f"{int(state.gauss.capacity)} "
                      f"({int(state.gauss.num_alive)} alive)", flush=True)

    n0 = int(state.gauss.num_alive)
    key_cap, restored = resolve_key_cap(
        n0, args.key_cap_mult, extra if start_ckpt else None)
    if restored:
        print(f"resume: restoring checkpoint key_cap {key_cap}", flush=True)

    common = dict(
        key_cap=key_cap,
        save_iterations=set(args.save_iterations),
        video_iterations=set(args.video_iterations),
        checkpoint_iterations=set(args.checkpoint_iterations),
        test_iterations=set(args.test_iterations),
        bg=bg, timer=timer, backend=args.backend, logger=logger,
        render_process=model_cfg.render_process, gui=gui)

    resume_iter = int(extra.get("iteration", 0)) if start_ckpt else 0
    if not skip_coarse:
        first_c = 0
        if resume_state is not None and "coarse" in os.path.basename(start_ckpt):
            # ``state`` already holds the (possibly compacted) resume state
            first_c = resume_iter
        state, hist_c = pipeline.scene_reconstruction(
            state, deform_cfg, scene, opt_cfg, hidden_cfg, None, "coarse",
            opt_cfg.coarse_iterations, gaussian_path, first_iter=first_c,
            **common)
        first_f = 0
    else:
        print("start from fine stage, skip coarse stage.")
        # NOTE: ``state`` already IS the resume state (swapped in, and
        # possibly capacity-compacted, right after loading above) — do not
        # re-assign ``resume_state`` here or the compaction is discarded
        first_f = resume_iter
    state, hist_f = pipeline.scene_reconstruction(
        state, deform_cfg, scene, opt_cfg, hidden_cfg, None, "fine",
        opt_cfg.iterations, gaussian_path, first_iter=first_f, **common)

    logger.close()
    print(f"\nTraining complete. ({timer.get_elapsed_time():.1f}s train time)")
    return state


if __name__ == "__main__":
    try:
        main()
    except BaseException:
        # fail FAST: after a device-backend error, interpreter teardown
        # tries to free device buffers through the (possibly wedged) tunnel
        # stream and can hang forever — print and hard-exit so the watchdog
        # can retry immediately
        import traceback
        traceback.print_exc()
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(3)
