#!/bin/bash
# Round-5 morning window: runs as soon as the night sequence (scenes 1/2)
# releases the tunnel.  Short, high-value hardware A/Bs, each wedge-guarded,
# strictly sequential:
#
#   1. fps_probe on scene_0 fine_20000 with MOM_TPU_RENDER_BANDS=4
#      (banded grouping sort + packed keys; baseline 3.6-3.9 FPS is already
#      banked in runlogs/export_render_r5.log)
#   2. oracle 10-iteration re-measure retry (the night attempt wedged)
#   3. fresh bench.py with the new defaults (gates + packed sort) — banks
#      BENCH_BANK.json so a later stale-bank flush stays honest
#   4. scan-unroll A/B: bench with MOM_TPU_SCAN_UNROLL=3 (multistep-vs-
#      single-step, round-4 verdict Weak #2)
set -u
cd "$(dirname "$0")/.."
LOG=runlogs/r5_morning.log
DEADLINE=${R5_MORNING_DEADLINE_EPOCH:?set a hard deadline epoch}
log() { echo "[morning $(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }
have_time() { [ $(( $(date +%s) + $1 )) -lt "$DEADLINE" ]; }

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

# wait for the night sequence to release the tunnel
while [ ! -f /tmp/r5_night_done ]; do
    if ! have_time 1500; then
        log "deadline close and night still running — exiting without attach"
        exit 0
    fi
    sleep 120
done
sleep 60

if have_time 1500 && [ ! -f runlogs/fps_bands_r5.json ]; then
    log "phase 1: fps_probe bands=4 on scene_0 fine_20000"
    MOM_TPU_RENDER_BANDS=4 guarded 1800 /tmp/r5_fps.log \
        python tools/fps_probe.py --input_dir demo/scene_0 \
            --checkpoint demo/scene_0/chkpnt_fine_20000.npz \
            --json runlogs/fps_bands_r5.json
    log "fps_probe rc=$?"
    cp /tmp/r5_fps.log runlogs/fps_bands_r5.log
    bank "banded-render FPS A/B on the finished scene_0 model" \
        runlogs/fps_bands_r5.json runlogs/fps_bands_r5.log
    sleep 60
fi

if have_time 1100 && [ ! -f /tmp/r5_skip_oracle ] \
    && ! grep -q '"n_iters": 10' ORACLE_BANK.json; then
    log "phase 2: oracle 10-iteration retry"
    guarded 1200 /tmp/r5_oracle2.log \
        python tools/measure_oracle.py --pts 262144 --res 512 --iters 10
    log "oracle rc=$?"
    cp /tmp/r5_oracle2.log runlogs/measure_oracle_r5.log
    bank "oracle baseline re-measured over 10 iterations" \
        ORACLE_BANK.json runlogs/measure_oracle_r5.log
    sleep 60
fi

if have_time 1500 && [ ! -f runlogs/bench_r5_defaults.json ]; then
    log "phase 3: bench with new defaults (gates + packed sort)"
    guarded 1500 /tmp/r5_bench.log python bench.py
    rc=$?
    log "bench rc=$rc"
    grep -o '{"metric".*' /tmp/r5_bench.log | tail -1 \
        > runlogs/bench_r5_defaults.json
    cp /tmp/r5_bench.log runlogs/bench_r5_defaults.log
    bank "fresh bench with round-5 defaults" runlogs/bench_r5_defaults.json \
        runlogs/bench_r5_defaults.log BENCH_BANK.json
    sleep 60
fi

if have_time 1500 && [ ! -f runlogs/bench_r5_unroll3.json ]; then
    log "phase 4: bench with MOM_TPU_SCAN_UNROLL=3"
    MOM_TPU_SCAN_UNROLL=3 guarded 1500 /tmp/r5_bench_u3.log python bench.py
    log "bench unroll rc=$?"
    grep -o '{"metric".*' /tmp/r5_bench_u3.log | tail -1 \
        > runlogs/bench_r5_unroll3.json
    cp /tmp/r5_bench_u3.log runlogs/bench_r5_unroll3.log
    bank "scan-unroll=3 bench A/B" runlogs/bench_r5_unroll3.json \
        runlogs/bench_r5_unroll3.log
fi

log "morning sequence complete"
touch /tmp/r5_morning_done
