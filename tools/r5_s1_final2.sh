#!/bin/bash
# Round-5 last-window scene_1 run: fine to 2500 (sized to the remaining
# tunnel hours after two wedge-kill cycles ate the 4000-target window),
# end-save + one insurance checkpoint, then export + eval, then release
# the tunnel to the morning A/Bs.
set -u
cd "$(dirname "$0")/.."
LOG=runlogs/r5_night.log
TRAIN_DEADLINE=${R5_TRAIN_DEADLINE_EPOCH:?}
FINAL_DEADLINE=${R5_FINAL_DEADLINE_EPOCH:?}
log() { echo "[final $(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }
have_time() { [ $(( $(date +%s) + $1 )) -lt "$FINAL_DEADLINE" ]; }

bank() {
    local msg=$1; shift
    for p in "$@"; do [ -e "$p" ] && git add -f -A "$p" 2>/dev/null; done
    git commit -q -m "$msg

No-Verification-Needed: run artifacts and logs only" || true
}

guarded() {
    local tmo=$1 lf=$2; shift 2
    python tools/run_guarded.py --stall_s 600 --timeout "$tmo" -- "$@" \
        > "$lf" 2>&1
    local rc=$?
    if [ $rc -eq 99 ]; then
        log "phase wedged; 300 s quiet, one retry"
        sleep 300
        python tools/run_guarded.py --stall_s 600 --timeout "$tmo" -- "$@" \
            >> "$lf" 2>&1
        rc=$?
    fi
    return $rc
}

S1=demo/scene_1
log "scene_1 fine run, checkpoints every 300 (wedge-tolerant banking)"
python tools/train_watchdog.py --input_dir "$S1" \
    --expname full_r5_s1 --log /tmp/full_r5_s1.log \
    --deadline_epoch "$TRAIN_DEADLINE" --ckpt_every 300 \
    -- --configs arguments/dnerf/r5_s1.py --iterations 2500 \
       --test_iterations 2500 --save_iterations 2500 \
       --video_iterations 2500 >> "$LOG" 2>&1
log "scene_1 watchdog rc=$?"
cp /tmp/full_r5_s1.log runlogs/full_r5_s1.log 2>/dev/null
bank "scene_1 stage-2 run log" runlogs/full_r5_s1.log "$S1/metrics.jsonl"
sleep 90

if have_time 1500 && ls "$S1"/chkpnt_fine_*.npz >/dev/null 2>&1; then
    guarded 2100 /tmp/r5_export_s1.log \
        python tools/export_from_checkpoint.py --input_dir "$S1" --render
    rc=$?
    log "scene_1 export rc=$rc"
    cp /tmp/r5_export_s1.log runlogs/export_s1_r5.log
    if [ $rc -eq 0 ]; then
        bank "scene_1 stage-3 exports (health-gated)" \
            "$S1/point_cloud" "$S1/frame_result" "$S1/vid_result" \
            runlogs/export_s1_r5.log
    else
        bank "scene_1 export log (rc=$rc)" runlogs/export_s1_r5.log
    fi
    sleep 90
fi
if have_time 1000 && ls "$S1"/chkpnt_fine_*.npz >/dev/null 2>&1; then
    guarded 1500 /tmp/r5_eval_s1.log \
        python tools/eval_from_checkpoint.py --input_dir "$S1" \
            --json runlogs/eval_s1_r5.json
    log "scene_1 eval rc=$?"
    cp /tmp/r5_eval_s1.log runlogs/eval_s1_r5.log
    bank "scene_1 offline eval" runlogs/eval_s1_r5.json runlogs/eval_s1_r5.log
    sleep 60
fi

log "final chain complete; releasing tunnel"
touch /tmp/r5_night_done
