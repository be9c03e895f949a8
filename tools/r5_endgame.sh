#!/bin/bash
# Round-5 post-scene_0 sequence, v2 (first export attempt wedged on its
# first bulk upload and burned 23 min of a 40-min timeout):
#
#   1. scene_0 offline export + eval, health-gated, WEDGE-GUARDED
#      (tools/run_guarded.py kills any phase whose socket flow freezes for
#      10 min, then retries once after a quiet period).
#   2. Perf window: gate_sweep (BIN_V2 / backward gates, subprocess
#      isolation, per-combo timeouts).
#   3. scene_1 stage-2 — r4_reduced if >115 min remain, else the r5_mini
#      schedule — then export + eval.
#   4. oracle re-measure, scene_2 stage-1: only if time remains.
#
# Single-client discipline: strictly sequential phases; a wedge kill is
# followed by a >=300 s full quiet before the retry.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_endgame.log
DEADLINE=${R5_DEADLINE_EPOCH:-0}
log() { echo "[r5 $(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

have_time() { [ "$DEADLINE" -eq 0 ] && return 0
              [ $(( $(date +%s) + $1 )) -lt "$DEADLINE" ]; }
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

S=demo/scene_0

# ---------- phase 1: scene_0 export + eval (health-gated) ----------
if have_time 1800 && [ ! -f /tmp/r5_export_ok ]; then
    log "phase 1: export_from_checkpoint --render (demand-sized caps)"
    guarded 2400 /tmp/r5_export.log \
        python tools/export_from_checkpoint.py --input_dir "$S" --render
    rc=$?
    cp /tmp/r5_export.log runlogs/export_render_r5.log
    if [ $rc -eq 0 ]; then
        log "export PASSED health gate; banking frames"
        touch /tmp/r5_export_ok
        bank "scene_0 stage-3 exports at fine 20000 (health-gated)" \
            "$S/point_cloud" "$S/frame_result" "$S/vid_result" \
            runlogs/export_render_r5.log
    else
        log "export FAILED (rc=$rc); banking log only"
        bank "scene_0 export attempt log (rc=$rc)" \
            runlogs/export_render_r5.log
    fi
    sleep 90
fi

if have_time 1500 && [ ! -f runlogs/eval_final_r5.json ]; then
    log "phase 1b: eval_from_checkpoint (demand-sized cap)"
    guarded 1800 /tmp/r5_eval.log \
        python tools/eval_from_checkpoint.py --input_dir "$S" \
            --json runlogs/eval_final_r5.json
    rc=$?
    cp /tmp/r5_eval.log runlogs/eval_final_r5.log
    bank "scene_0 offline eval at fine 20000 (rc=$rc)" \
        runlogs/eval_final_r5.json runlogs/eval_final_r5.log
    sleep 90
fi

# ---------- phase 2: perf window ----------
if have_time 2100 && [ ! -f runlogs/gate_sweep_r5.json ]; then
    log "phase 2: gate sweep (BIN_V2 + backward gates), subprocess-isolated"
    MOM_TPU_SWEEP_ONLY=baseline,binv2,bwd_all,bwd_all_binv2 \
    MOM_TPU_SWEEP_COMBO_TIMEOUT=600 MOM_TPU_SWEEP_QUIET=45 \
    timeout 2700 python tools/gate_sweep.py 262144 512x512 12 --subproc \
        --out runlogs/gate_sweep_r5.json > /tmp/r5_sweep.log 2>&1
    cp /tmp/r5_sweep.log runlogs/gate_sweep_r5.log
    bank "gate sweep on hardware: BIN_V2 + backward-gate A/B" \
        runlogs/gate_sweep_r5.json runlogs/gate_sweep_r5.log
    sleep 60
fi

# ---------- phase 3: scene_1 ----------
S1=demo/scene_1
if have_time 3600 && ! ls -d "$S1"/point_cloud/iteration_* >/dev/null 2>&1; then
    if [ ! -f "$S1/MOM/train_data.pth" ] \
        && [ -f "$S1/rescue/mom_stage1.tar.gz" ]; then
        tar -xzf "$S1/rescue/mom_stage1.tar.gz" -C "$S1"
        log "restored scene_1 stage-1 MOM from rescue"
    fi
    if [ -f "$S1/MOM/train_data.pth" ]; then
        CFG=arguments/dnerf/r4_reduced.py; FINAL=7000
        if [ "$(mins_left)" -lt 115 ]; then
            CFG=arguments/dnerf/r5_mini.py; FINAL=4000
        fi
        log "phase 3: scene_1 stage-2 ($CFG, $(mins_left) min left)"
        python tools/train_watchdog.py --input_dir "$S1" \
            --expname full_r5_s1 --log /tmp/full_r5_s1.log \
            --deadline_epoch "$DEADLINE" \
            -- --configs "$CFG" \
               --test_iterations 3000 "$FINAL" \
               --save_iterations "$FINAL" \
               --video_iterations "$FINAL" >> "$LOG" 2>&1
        log "scene_1 stage-2 watchdog exited rc=$?"
        sleep 90
        if have_time 1500; then
            guarded 1800 /tmp/r5_export_s1.log \
                python tools/export_from_checkpoint.py --input_dir "$S1" \
                    --render
            rc=$?
            cp /tmp/r5_export_s1.log runlogs/export_s1_r5.log
            [ $rc -eq 0 ] && bank "scene_1 stage-3 exports (health-gated)" \
                "$S1/point_cloud" "$S1/frame_result" "$S1/vid_result" \
                runlogs/export_s1_r5.log
            [ $rc -eq 0 ] || bank "scene_1 export log (rc=$rc)" \
                runlogs/export_s1_r5.log
            sleep 90
        fi
        if have_time 1200; then
            guarded 1500 /tmp/r5_eval_s1.log \
                python tools/eval_from_checkpoint.py --input_dir "$S1" \
                    --json runlogs/eval_s1_r5.json
            cp /tmp/r5_eval_s1.log runlogs/eval_s1_r5.log
            bank "scene_1 offline eval" runlogs/eval_s1_r5.json \
                runlogs/eval_s1_r5.log
            sleep 60
        fi
    else
        log "scene_1 stage-1 artifacts missing; skipping"
    fi
fi

# ---------- phase 4 (time permitting): oracle, scene_2 stage-1 ----------
if have_time 900 && ! grep -q '"n_iters": 10' ORACLE_BANK.json 2>/dev/null; then
    log "phase 4: oracle re-measure (10 iterations)"
    guarded 900 /tmp/r5_oracle.log \
        python tools/measure_oracle.py --pts 262144 --res 512 --iters 10
    cp /tmp/r5_oracle.log runlogs/measure_oracle_r5.log
    bank "oracle baseline re-measured over 10 iterations" \
        ORACLE_BANK.json runlogs/measure_oracle_r5.log
    sleep 60
fi

S2=demo/scene_2
if have_time 3900 && [ ! -f "$S2/MOM/train_data.pth" ]; then
    log "phase 4b: scene_2 stage-1"
    guarded 3900 /tmp/stage1_s2.log python train_motion.py --input_dir "$S2"
    log "scene_2 stage-1 rc=$?"
    cp /tmp/stage1_s2.log runlogs/ 2>/dev/null
    bank "scene_2 stage-1 log" runlogs/stage1_s2.log
fi

log "r5 endgame sequence complete"
touch /tmp/r5_endgame_done
