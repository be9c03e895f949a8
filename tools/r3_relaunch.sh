#!/bin/bash
# One-command idempotent recovery after a dev-VM reset: restart whichever of
# the round-3 run processes (orchestrator -> watchdog -> trainer, milestone
# committer, endgame sentinel) are not already running.  Safe to re-run at
# any time; each component is guarded by a live-pid check so a healthy tree
# is left untouched.
#
# Usage: bash tools/r3_relaunch.sh [sentinel_deadline_epoch_s]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-1787089500}   # 2026-08-18 21:25 UTC (round budget minus window)

alive() {  # alive <pidfile>
    [ -f "$1" ] || return 1
    local pid; pid=$(cat "$1")
    [ -n "$pid" ] && [ -d "/proc/$pid" ]
}

# endgame already ran/running: never restart training on top of it
if [ -f /tmp/endgame.started ]; then
    echo "[relaunch] endgame marker present; not restarting anything"
    exit 0
fi

if alive /tmp/r3_orch.pid; then
    echo "[relaunch] orchestrator alive ($(cat /tmp/r3_orch.pid))"
else
    nohup bash tools/r3_full_run.sh >> /tmp/r3_orch.log 2>&1 &
    echo $! > /tmp/r3_orch.pid
    echo "[relaunch] orchestrator started ($(cat /tmp/r3_orch.pid))"
fi

if alive /tmp/r3_committer.pid; then
    echo "[relaunch] committer alive ($(cat /tmp/r3_committer.pid))"
else
    nohup bash tools/r3_committer.sh >> /tmp/r3_committer.log 2>&1 &
    echo $! > /tmp/r3_committer.pid
    echo "[relaunch] committer started ($(cat /tmp/r3_committer.pid))"
fi

if alive /tmp/r3_sentinel.pid; then
    echo "[relaunch] sentinel alive ($(cat /tmp/r3_sentinel.pid))"
else
    nohup bash tools/r3_sentinel.sh "$DEADLINE" >> /tmp/sentinel.log 2>&1 &
    echo $! > /tmp/r3_sentinel.pid
    echo "[relaunch] sentinel started ($(cat /tmp/r3_sentinel.pid))"
fi
