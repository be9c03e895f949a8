#!/usr/bin/env python
"""Run a device-tunnel command with fast wedge detection.

The remote-TPU stream can wedge a client on its first bulk transfer: the
process sits alive at <1 CPU tick/s with zero socket flow while a naive
timeout burns the whole phase budget (round-4 lost its endgame this way;
round-5's first export attempt sat 23 min in exactly this state).  A
wedged client reads NOTHING (rchar frozen, keepalive writes only), while
every healthy phase — checkpoint load, param upload, compile responses,
execution results — moves bytes at least every few minutes.

This supervisor launches the command and kills the whole tree as soon as
the tree-wide rchar+wchar has moved < min_flow bytes for stall_s seconds
(default 600 s: longer than any compile gap observed on a healthy tunnel,
20x shorter than a phase timeout).  Exit codes: child's own, or 99 on a
wedge kill, 98 on overall timeout.

Usage: run_guarded.py [--stall_s 600] [--timeout 2400] [--min_flow 65536]
                      -- cmd args...
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def tree_pids(root: int) -> list[int]:
    pids, todo = [], [root]
    while todo:
        p = todo.pop()
        pids.append(p)
        try:
            with open(f"/proc/{p}/task/{p}/children") as f:
                todo += [int(c) for c in f.read().split()]
        except OSError:
            pass
    return pids


def tree_flow(root: int) -> int:
    total = 0
    for p in tree_pids(root):
        try:
            with open(f"/proc/{p}/io") as f:
                for line in f:
                    if line.startswith(("rchar:", "wchar:")):
                        total += int(line.split()[1])
        except OSError:
            pass
    return total


def kill_tree(root: int, sig=signal.SIGTERM):
    pids = tree_pids(root)
    for p in reversed(pids):          # children first
        try:
            os.kill(p, sig)
        except OSError:
            pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stall_s", type=int, default=600)
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--min_flow", type=int, default=65536,
                    help="bytes of tree rchar+wchar growth that count as "
                         "life (keepalives are ~100 B/30 s)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    assert cmd, "no command given"

    proc = subprocess.Popen(cmd)
    t0 = time.time()
    last_flow = tree_flow(proc.pid)
    last_move = t0
    while True:
        time.sleep(15)
        rc = proc.poll()
        if rc is not None:
            return rc
        now = time.time()
        flow = tree_flow(proc.pid)
        if flow - last_flow >= args.min_flow:
            last_flow, last_move = flow, now
        if now - last_move > args.stall_s:
            print(f"[guard] WEDGE: <{args.min_flow}B flow in "
                  f"{args.stall_s}s — killing tree", file=sys.stderr,
                  flush=True)
            kill_tree(proc.pid)
            time.sleep(5)
            kill_tree(proc.pid, signal.SIGKILL)
            proc.wait()
            return 99
        if now - t0 > args.timeout:
            print("[guard] phase timeout — killing tree", file=sys.stderr,
                  flush=True)
            kill_tree(proc.pid)
            time.sleep(5)
            kill_tree(proc.pid, signal.SIGKILL)
            proc.wait()
            return 98


if __name__ == "__main__":
    sys.exit(main())
