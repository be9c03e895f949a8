#!/usr/bin/env python
"""Stall watchdog for long train_4DGS runs on a flaky device tunnel.

This machine's remote-TPU service can wedge a client stream indefinitely
(see mom_tpu/__init__.py's compilation-cache note).  The watchdog launches
train_4DGS with periodic full-state checkpoints, monitors log progress, and
on a stall kills the run and relaunches it from the newest checkpoint
(iteration-accurate resume via --start_checkpoint).

Usage:
  python tools/train_watchdog.py --input_dir demo/scene_0 --expname full_r2 \
      [--stall_sec 600] [--max_restarts 10] [--log /tmp/full_run.log] \
      [-- extra train_4DGS args...]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import signal
import subprocess
import sys
import time


def newest_checkpoint(model_path: str):
    cands = glob.glob(os.path.join(model_path, "chkpnt_*_*.npz"))
    best, best_key = None, (-1, -1)
    for c in cands:
        m = re.match(r"chkpnt_(coarse|fine)_(\d+)\.npz", os.path.basename(c))
        if not m:
            continue
        key = (1 if m.group(1) == "fine" else 0, int(m.group(2)))
        if key > best_key:
            best, best_key = c, key
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--expname", default="full_r2")
    ap.add_argument("--stall_sec", type=int, default=600)
    ap.add_argument("--max_restarts", type=int, default=12)
    ap.add_argument("--startup_grace_sec", type=int, default=1500,
                    help="compile time allowance before the first log line")
    ap.add_argument("--log", default="/tmp/train_watchdog_run.log")
    ap.add_argument("--ckpt_every", type=int, default=1000)
    ap.add_argument("--deadline_epoch", type=int, default=0,
                    help="unix time after which the run is STOPPED cleanly "
                         "(child killed, exit 0) — the round driver needs "
                         "the single-client tunnel back for its bench; "
                         "checkpoints every --ckpt_every bound the loss")
    args, extra = ap.parse_known_args()
    if extra and extra[0] == "--":
        extra = extra[1:]

    # checkpoints land in input_dir itself (train_4DGS.py:75 gaussian_path =
    # input_dir, the reference's scene-dir layout)
    model_path = args.input_dir
    ckpts = [str(i) for i in range(args.ckpt_every, 20001, args.ckpt_every)]

    restarts = 0
    while restarts <= args.max_restarts:
        cmd = [sys.executable, "train_4DGS.py",
               "--input_dir", args.input_dir, "--expname", args.expname,
               "--checkpoint_iterations", *ckpts]
        resume = newest_checkpoint(model_path)
        if resume:
            cmd += ["--start_checkpoint", resume]
        cmd += extra
        print(f"[watchdog] launch (restart {restarts}): {' '.join(cmd)}",
              flush=True)
        logf = open(args.log, "ab", buffering=0)
        logf.write(f"\n===== watchdog launch {restarts} {time.ctime()}"
                   f" resume={resume} =====\n".encode())
        proc = subprocess.Popen(cmd, stdout=logf, stderr=subprocess.STDOUT,
                                cwd=os.path.dirname(os.path.dirname(
                                    os.path.abspath(__file__))))
        def cpu_ticks():
            try:
                with open(f"/proc/{proc.pid}/stat") as f:
                    parts = f.read().split()
                return int(parts[13]) + int(parts[14])
            except Exception:
                return None

        start = time.time()
        last_size = os.path.getsize(args.log)
        last_ticks = cpu_ticks() or 0
        last_active = time.time()
        last_log_growth = time.time()
        stalled = False
        while True:
            time.sleep(30)
            rc = proc.poll()
            if rc is not None:
                break
            if args.deadline_epoch and time.time() > args.deadline_epoch:
                print("[watchdog] deadline reached — stopping run cleanly",
                      flush=True)
                proc.terminate()
                try:
                    proc.wait(timeout=60)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    proc.wait()
                logf.close()
                return 0
            size = os.path.getsize(args.log)
            ticks = cpu_ticks()
            # "active" = the log grew OR the child is burning CPU (an XLA
            # compile is log-silent for many minutes but CPU-hot; a wedged
            # tunnel stream is usually silent AND idle)
            if size != last_size:
                last_log_growth = time.time()
            if size != last_size or (ticks is not None
                                     and ticks - last_ticks > 100):
                last_active = time.time()
            last_size = size
            if ticks is not None:
                last_ticks = ticks
            allowance = (args.startup_grace_sec
                         if time.time() - start < args.startup_grace_sec
                         else args.stall_sec)
            # hard cap: a wedged tunnel client can SPIN (grpc poll/keepalive
            # burns CPU with zero training progress — observed r3, coarse
            # 2100: 20+ min CPU-hot wedge the CPU exemption kept alive).
            # Mid-run the log grows every <=100 iterations (~1 min); even
            # a full 25-view eval stays well under this.
            hard = max(args.startup_grace_sec
                       if time.time() - start < args.startup_grace_sec
                       else 0, 3 * args.stall_sec)
            if (time.time() - last_active > allowance
                    or time.time() - last_log_growth > hard):
                print(f"[watchdog] STALL (> {allowance}s without log or "
                      "CPU progress, or > {0}s without log growth) — "
                      "killing".format(hard), flush=True)
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                stalled = True
                break
        logf.close()
        if not stalled and proc.returncode == 0:
            print("[watchdog] training completed", flush=True)
            return 0
        restarts += 1
        # post-kill quiet time: a wedged tunnel stream needs ~10 min of
        # full silence before a new client can attach reliably (observed
        # twice: a 60s-delay relaunch wedged again immediately; a ~10 min
        # quiet relaunch recovered).  Escalate if a relaunch wedges anyway.
        quiet = 60 if not stalled else min(600 * restarts, 1800)
        print(f"[watchdog] sleeping {quiet}s before relaunch", flush=True)
        time.sleep(quiet)
    print("[watchdog] giving up after max restarts", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
