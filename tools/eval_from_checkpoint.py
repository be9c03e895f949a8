#!/usr/bin/env python
"""Score a training checkpoint on the full 25-view test set (L1/PSNR/SSIM),
offline — the same scan-batched evaluator the training loop runs at
``test_iterations`` (mom_tpu/pipeline.py:make_eval_scan), detached from the
run so ANY banked checkpoint can be scored after the fact.

The reference computes these numbers only inside training_report
(train_4DGS.py:354-404); an offline evaluator matters here because a flaky
tunnel can end a run between eval milestones.

Usage:
  python tools/eval_from_checkpoint.py --input_dir demo/scene_0 \
      [--checkpoint demo/scene_0/chkpnt_fine_12000.npz] [--json out.json]
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
                    help="evaluate a post-opacity-reset checkpoint anyway")
    ap.add_argument("--key_cap_mult", type=float, default=0.0,
                    help="0 (default) = size key_cap from a measured demand "
                         "scan over the test views; >0 = legacy alive*mult")
    ap.add_argument("--lpips", action="store_true",
                    help="also score LPIPS (random-init AlexNet fallback "
                         "when no converted weights exist on this machine)")
    ap.add_argument("--json", default=None, help="also write result here")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ckpt_select import pick_checkpoint
    from offline_common import load_offline_state
    ckpt_path = pick_checkpoint(args.input_dir, args.checkpoint,
                                args.allow_reset_boundary)
    assert ckpt_path, "no checkpoint found"

    # honor JAX_PLATFORMS=cpu: this machine's JAX force-registers an 'axon'
    # TPU platform that overrides the env var (tests/conftest.py note) — a
    # CPU-intended child must never attach to the single-client tunnel
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from mom_tpu import pipeline
    from mom_tpu.ops.rasterize import CHUNK

    scene, state, deform_cfg, stage, iteration, extra = load_offline_state(
        args.input_dir, ckpt_path)
    print(f"evaluating {ckpt_path} (stage={stage}, iter={iteration})",
          flush=True)

    W, H = scene.width, scene.height
    bg = np.zeros(3, np.float32)
    n0 = int(np.asarray(state.gauss.aux.alive).sum())

    test_cams = scene.test_cams
    packed = pipeline.pack_cameras(test_cams)
    if args.key_cap_mult > 0:
        key_cap = ((int(n0 * args.key_cap_mult) + CHUNK - 1)
                   // CHUNK) * CHUNK
    else:
        ds = pipeline.make_demand_scan(deform_cfg, W, H, stage=stage)
        d = np.asarray(ds(state.gauss.params, state.gauss.aux, state.deform,
                          {k: jnp.asarray(v) for k, v in packed.items()}))
        key_cap = pipeline.size_key_cap(int(d.max()))
        print(f"demand-sized key_cap={key_cap} "
              f"(max view demand {int(d.max())})", flush=True)
    gts = pipeline._gt_stack(test_cams)
    ev = pipeline.make_eval_scan(deform_cfg, W, H, bg, stage=stage,
                                 key_cap=key_cap)
    l1s, psnrs, ssims, ovfs, insts, brights = ev(
        state.gauss.params, state.gauss.aux, state.deform,
        {k: jnp.asarray(v) for k, v in packed.items()}, jnp.asarray(gts))
    result = {"checkpoint": os.path.basename(ckpt_path),
              "stage": stage, "iteration": iteration,
              "n_views": len(test_cams), "alive_points": n0,
              "l1": float(jnp.mean(l1s)), "psnr": float(jnp.mean(psnrs)),
              "ssim": float(jnp.mean(ssims)),
              "per_view_psnr": [round(float(p), 2) for p in psnrs],
              "max_overflow": int(jnp.max(ovfs)),
              "max_instances": int(jnp.max(insts)),
              "key_cap": key_cap,
              "mean_brightness": float(jnp.mean(brights) * 255.0)}
    # health gate (round-4 postmortem): refuse to bless saturated or
    # black renders as an eval number
    result["healthy"] = bool(result["max_overflow"] == 0
                             and result["mean_brightness"] > 8.0)

    if args.lpips:
        # LPIPS over the rendered test views (reference wires lpips into
        # loss_utils, utils/loss_utils.py:20-22).  A NUMBER IS ONLY EMITTED
        # when converted AlexNet weights exist (MOM_TPU_LPIPS_CKPT): a
        # random-init backbone yields values that invite comparison with
        # published LPIPS despite measuring nothing comparable (round-4
        # verdict Weak #4) — without weights the field records why it is
        # absent instead.
        lp_path = os.environ.get("MOM_TPU_LPIPS_CKPT")
        if lp_path and os.path.exists(lp_path):
            from mom_tpu.train import lpips as LP
            lp_params = LP.load_lpips(lp_path)
            rs = pipeline.make_render_scan(deform_cfg, W, H, bg, stage=stage,
                                           key_cap=key_cap)
            frames = rs(state.gauss.params, state.gauss.aux, state.deform,
                        {k: jnp.asarray(v) for k, v in packed.items()})
            dist = jax.jit(LP.lpips_distance)
            vals = [float(dist(lp_params,
                               frames[i].astype(jnp.float32) / 255.0,
                               gts[i].astype(jnp.float32) / 255.0))
                    for i in range(len(test_cams))]
            result["lpips"] = float(np.mean(vals))
            result["lpips_backend"] = "converted-weights"
        else:
            result["lpips_backend"] = (
                "omitted: no converted AlexNet weights on this machine "
                "(set MOM_TPU_LPIPS_CKPT)")
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
