#!/bin/bash
# Endgame sentinel: fallback trigger for tools/r3_endgame.sh.  Fires when the
# full-run orchestrator exits (training schedule complete or failed) or at a
# hard UTC deadline, whichever comes first — so the round's measurement
# window (exports, eval, bench, gate sweep) happens even if the interactive
# session that launched the run is gone.  Guarded by a marker file so a
# manual endgame invocation can pre-empt it (touch /tmp/endgame.started).
#
# Usage: bash tools/r3_sentinel.sh [deadline_epoch_s]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-0}
MARKER=/tmp/endgame.started
LOG=/tmp/sentinel.log
echo "[sentinel] start $(date -u) deadline=$DEADLINE" >> "$LOG"

orch_alive() {
    [ -f /tmp/r3_orch.pid ] || return 1
    local pid; pid=$(cat /tmp/r3_orch.pid)
    [ -n "$pid" ] && [ -d "/proc/$pid" ]
}

dead_polls=0
while true; do
    if [ -f "$MARKER" ]; then
        echo "[sentinel] marker present; exiting" >> "$LOG"
        exit 0
    fi
    now=$(date -u +%s)
    if [ "$DEADLINE" -gt 0 ] && [ "$now" -ge "$DEADLINE" ]; then
        echo "[sentinel] deadline reached $(date -u)" >> "$LOG"
        break
    fi
    if orch_alive; then
        dead_polls=0
    else
        dead_polls=$((dead_polls + 1))
        echo "[sentinel] orch not alive (poll $dead_polls) $(date -u)" >> "$LOG"
        # two consecutive misses = the run really ended (not a pid-file race)
        [ "$dead_polls" -ge 2 ] && break
    fi
    sleep 120
done

if [ -f "$MARKER" ]; then
    echo "[sentinel] marker appeared; exiting" >> "$LOG"
    exit 0
fi
touch "$MARKER"
echo "[sentinel] launching endgame $(date -u)" >> "$LOG"
bash tools/r3_endgame.sh >> "$LOG" 2>&1
echo "[sentinel] endgame done $(date -u)" >> "$LOG"
