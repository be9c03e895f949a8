#!/bin/bash
# Round-5 overnight sequence (fresh VM, fresh tunnel, ~12 h window).
# Strictly sequential single-client phases, each wedge-guarded:
#
#   0. wait for any in-flight eval/export client to exit
#   A. gate_sweep at bench scale (512^2/262k) — BIN_V2 + backward gates,
#      subprocess isolation (the earlier full-res sweep RESOURCE_EXHAUSTED
#      on every combo; bench scale is what BENCH_r05 runs at anyway)
#   B. oracle re-measure over 10 iterations (verdict Weak #6)
#   C. scene_1 stage-2 (r4_reduced) + export + eval  (verdict Missing #2)
#   D. scene_2 stage-1 + stage-2 + export + eval     (verdict Missing #2)
#
# Deadline-gated: R5_NIGHT_DEADLINE_EPOCH bounds every phase so the driver
# bench window at round end is never squeezed.
set -u
cd "$(dirname "$0")/.."
LOG=runlogs/r5_night.log
DEADLINE=${R5_NIGHT_DEADLINE_EPOCH:?set a hard deadline epoch}
log() { echo "[night $(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }
have_time() { [ $(( $(date +%s) + $1 )) -lt "$DEADLINE" ]; }
mins_left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }

bank() {  # bank <msg> <paths...>
    local msg=$1; shift
    for p in "$@"; do [ -e "$p" ] && git add -f -A "$p" 2>/dev/null; done
    git commit -q -m "$msg

No-Verification-Needed: run artifacts and logs only" || true
}

guarded() {  # guarded <timeout_s> <logfile> cmd...  (one retry after quiet)
    local tmo=$1 lf=$2; shift 2
    python tools/run_guarded.py --stall_s 600 --timeout "$tmo" -- "$@" \
        > "$lf" 2>&1
    local rc=$?
    if [ $rc -eq 99 ]; then
        log "phase wedged; 300 s full quiet, then one retry"
        sleep 300
        python tools/run_guarded.py --stall_s 600 --timeout "$tmo" -- "$@" \
            >> "$lf" 2>&1
        rc=$?
    fi
    return $rc
}

# ---------- phase 0: wait for the in-flight eval to release the tunnel ----
while pgrep -f eval_from_checkpoint.py > /dev/null 2>&1; do
    log "waiting for in-flight eval client to exit"
    sleep 60
done
sleep 30

# ---------- phase A: gate sweep at bench scale ----------
if have_time 3000 && [ ! -f runlogs/gate_sweep_r5.json ]; then
    log "phase A: gate sweep 512^2/262k (BIN_V2 + backward gates), subproc"
    MOM_TPU_SWEEP_ONLY=baseline,binv2,bwd_all,bwd_all_binv2,chunk256 \
    MOM_TPU_SWEEP_COMBO_TIMEOUT=600 MOM_TPU_SWEEP_QUIET=45 \
    timeout 3300 python tools/gate_sweep.py 262144 512x512 12 --subproc \
        --out runlogs/gate_sweep_r5.json > /tmp/r5_sweep.log 2>&1
    log "gate sweep rc=$?"
    cp /tmp/r5_sweep.log runlogs/gate_sweep_r5.log
    bank "gate sweep on hardware at bench scale: BIN_V2 + backward gates" \
        runlogs/gate_sweep_r5.json runlogs/gate_sweep_r5.log
    sleep 60
fi

# ---------- phase B: oracle 10-iteration re-measure ----------
if have_time 1200 && [ ! -f /tmp/r5_skip_oracle ] \
    && ! grep -q '"n_iters": 10' ORACLE_BANK.json 2>/dev/null; then
    log "phase B: oracle re-measure (10 iterations)"
    guarded 1200 /tmp/r5_oracle.log \
        python tools/measure_oracle.py --pts 262144 --res 512 --iters 10
    log "oracle rc=$?"
    cp /tmp/r5_oracle.log runlogs/measure_oracle_r5.log
    bank "oracle baseline re-measured over 10 iterations" \
        ORACLE_BANK.json runlogs/measure_oracle_r5.log
    sleep 60
fi

# ---------- phase C: scene_1 stage-2 + export + eval ----------
S1=demo/scene_1
if have_time 5400 && ! ls -d "$S1"/point_cloud/iteration_* >/dev/null 2>&1; then
    if [ ! -f "$S1/MOM/train_data.pth" ] \
        && [ -f "$S1/rescue/mom_stage1.tar.gz" ]; then
        tar -xzf "$S1/rescue/mom_stage1.tar.gz" -C "$S1"
        log "restored scene_1 stage-1 MOM from rescue"
    fi
    if [ -f "$S1/MOM/train_data.pth" ]; then
        # 1080p scene_1 trains ~0.5-0.8 it/s: the full r4_reduced fine
        # stage cannot finish AND export before the deadline after the
        # 02:5x wedge recovery — fixed shortened schedule instead
        CFG=arguments/dnerf/r5_s1.py; FINAL=4000
        log "phase C: scene_1 stage-2 ($CFG, $(mins_left) min left)"
        python tools/train_watchdog.py --input_dir "$S1" \
            --expname full_r5_s1 --log /tmp/full_r5_s1.log \
            --deadline_epoch "$DEADLINE" \
            -- --configs "$CFG" \
               --test_iterations "$FINAL" \
               --save_iterations "$FINAL" \
               --video_iterations "$FINAL" >> "$LOG" 2>&1
        log "scene_1 stage-2 watchdog exited rc=$?"
        cp /tmp/full_r5_s1.log runlogs/full_r5_s1.log 2>/dev/null
        bank "scene_1 stage-2 run log" runlogs/full_r5_s1.log \
            "$S1/metrics.jsonl"
        sleep 90
        if have_time 2100 && ls "$S1"/chkpnt_fine_*.npz >/dev/null 2>&1; then
            guarded 2100 /tmp/r5_export_s1.log \
                python tools/export_from_checkpoint.py --input_dir "$S1" \
                    --render
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
        if have_time 1500 && ls "$S1"/chkpnt_fine_*.npz >/dev/null 2>&1; then
            guarded 1800 /tmp/r5_eval_s1.log \
                python tools/eval_from_checkpoint.py --input_dir "$S1" \
                    --json runlogs/eval_s1_r5.json
            log "scene_1 eval rc=$?"
            cp /tmp/r5_eval_s1.log runlogs/eval_s1_r5.log
            bank "scene_1 offline eval" runlogs/eval_s1_r5.json \
                runlogs/eval_s1_r5.log
            sleep 60
        fi
    else
        log "scene_1 stage-1 artifacts missing; skipping"
    fi
fi

# ---------- phase D: scene_2 end-to-end ----------
S2=demo/scene_2
if have_time 4500 && [ ! -f "$S2/MOM/train_data.pth" ]; then
    log "phase D: scene_2 stage-1 ($(mins_left) min left)"
    guarded 4200 /tmp/stage1_s2.log python train_motion.py --input_dir "$S2"
    log "scene_2 stage-1 rc=$?"
    cp /tmp/stage1_s2.log runlogs/stage1_s2.log 2>/dev/null
    bank "scene_2 stage-1 run log" runlogs/stage1_s2.log
    sleep 90
fi
if have_time 5400 && [ -f "$S2/MOM/train_data.pth" ] \
    && ! ls -d "$S2"/point_cloud/iteration_* >/dev/null 2>&1; then
    CFG=arguments/dnerf/r4_reduced.py; FINAL=7000
    if [ "$(mins_left)" -lt 150 ]; then
        CFG=arguments/dnerf/r5_mini.py; FINAL=4000
    fi
    log "phase D: scene_2 stage-2 ($CFG, $(mins_left) min left)"
    python tools/train_watchdog.py --input_dir "$S2" \
        --expname full_r5_s2 --log /tmp/full_r5_s2.log \
        --deadline_epoch "$DEADLINE" \
        -- --configs "$CFG" \
           --test_iterations 3000 "$FINAL" \
           --save_iterations "$FINAL" \
           --video_iterations "$FINAL" >> "$LOG" 2>&1
    log "scene_2 stage-2 watchdog exited rc=$?"
    cp /tmp/full_r5_s2.log runlogs/full_r5_s2.log 2>/dev/null
    bank "scene_2 stage-2 run log" runlogs/full_r5_s2.log "$S2/metrics.jsonl"
    sleep 90
    if have_time 2100 && ls "$S2"/chkpnt_fine_*.npz >/dev/null 2>&1; then
        guarded 2100 /tmp/r5_export_s2.log \
            python tools/export_from_checkpoint.py --input_dir "$S2" --render
        rc=$?
        log "scene_2 export rc=$rc"
        cp /tmp/r5_export_s2.log runlogs/export_s2_r5.log
        if [ $rc -eq 0 ]; then
            bank "scene_2 stage-3 exports (health-gated)" \
                "$S2/point_cloud" "$S2/frame_result" "$S2/vid_result" \
                runlogs/export_s2_r5.log
        else
            bank "scene_2 export log (rc=$rc)" runlogs/export_s2_r5.log
        fi
        sleep 90
    fi
    if have_time 1500 && ls "$S2"/chkpnt_fine_*.npz >/dev/null 2>&1; then
        guarded 1800 /tmp/r5_eval_s2.log \
            python tools/eval_from_checkpoint.py --input_dir "$S2" \
                --json runlogs/eval_s2_r5.json
        log "scene_2 eval rc=$?"
        cp /tmp/r5_eval_s2.log runlogs/eval_s2_r5.log
        bank "scene_2 offline eval" runlogs/eval_s2_r5.json \
            runlogs/eval_s2_r5.log
        sleep 60
    fi
fi

log "night sequence complete ($(mins_left) min to deadline)"
touch /tmp/r5_night_done
