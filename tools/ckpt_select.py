"""Deliverable-checkpoint selection shared by the export/eval tools.

Full-state checkpoints are written AFTER the structural block
(mom_tpu/pipeline.py:537-546, matching the reference's checkpoint ordering,
train_4DGS.py:288-301), so a checkpoint whose iteration coincides with an
opacity reset holds every gaussian clamped to opacity 0.01 — useless as an
export/eval source (round-3 shipped PSNR-8.99 renders exactly this way).
The reference's *inference* exports instead come from scene.save at
save_iterations, which runs BEFORE the structural block
(train_4DGS.py:248-251); our save_scene matches that ordering, so
point_cloud/iteration_N dirs are always healthy.  This module keeps the
checkpoint-based salvage path equally safe.
"""

from __future__ import annotations

import glob
import os
import re


def parse_checkpoint_name(path: str):
    m = re.match(r"chkpnt_(coarse|fine)_(\d+)\.npz", os.path.basename(path))
    if not m:
        return None
    return m.group(1), int(m.group(2))


def is_reset_boundary(stage: str, iteration: int,
                      opacity_reset_interval: int = 3000,
                      densify_until_iter: int = 15_000) -> bool:
    """True when the checkpoint at ``iteration`` was written immediately
    after an opacity reset (train.loop.StructuralSchedule.structural_actions:
    reset fires when iteration %% opacity_reset_interval == 0 and
    iteration < densify_until_iter)."""
    if iteration <= 0 or iteration >= densify_until_iter:
        return False
    return iteration % opacity_reset_interval == 0


def list_checkpoints(model_path: str):
    """All full-state checkpoints, best-last ((stage_rank, iter) order)."""
    out = []
    for c in glob.glob(os.path.join(model_path, "chkpnt_*_*.npz")):
        parsed = parse_checkpoint_name(c)
        if parsed:
            out.append((1 if parsed[0] == "fine" else 0, parsed[1], c))
    out.sort()
    return [c for _, _, c in out]


def pick_checkpoint(model_path: str, requested: str | None = None,
                    allow_reset_boundary: bool = False,
                    opacity_reset_interval: int = 3000,
                    densify_until_iter: int = 15_000):
    """Resolve the checkpoint to export/eval from.

    With ``requested`` set, validates it (raises on a reset boundary unless
    allowed).  Otherwise picks the newest checkpoint that is NOT at a reset
    boundary, falling back to the newest overall (with a loud warning) only
    when every candidate sits on a boundary.
    """
    if requested:
        parsed = parse_checkpoint_name(requested)
        if parsed and not allow_reset_boundary and is_reset_boundary(
                *parsed, opacity_reset_interval=opacity_reset_interval,
                densify_until_iter=densify_until_iter):
            raise SystemExit(
                f"refusing {requested}: iteration {parsed[1]} is an "
                "opacity-reset boundary (every gaussian at opacity ~0.01; "
                "exports from it are black — round-3 verdict Weak #1). "
                "Pass --allow_reset_boundary to override, or pick a "
                "neighboring checkpoint.")
        return requested
    cands = list_checkpoints(model_path)
    if not cands:
        return None
    healthy = [c for c in cands
               if not is_reset_boundary(
                   *parse_checkpoint_name(c),
                   opacity_reset_interval=opacity_reset_interval,
                   densify_until_iter=densify_until_iter)]
    if healthy:
        if healthy[-1] != cands[-1]:
            print(f"[ckpt_select] skipping reset-boundary checkpoint "
                  f"{os.path.basename(cands[-1])} -> using "
                  f"{os.path.basename(healthy[-1])}", flush=True)
        return healthy[-1]
    print(f"[ckpt_select] WARNING: every checkpoint in {model_path} sits on "
          "an opacity-reset boundary; using the newest anyway — expect "
          "near-black renders", flush=True)
    return cands[-1]
