#!/bin/bash
# Post-training TPU measurement window: run every perf measurement the round
# needs, banking each result to its own file so a tunnel flake mid-sequence
# loses only the remaining steps.  Run AFTER the training process has exited
# (the chip is single-tenant).
#
# Usage: bash tools/tpu_window.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_window}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <env...> -- <cmd...>
    local name=$1 tmo=$2; shift 2
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    echo "=== $name (timeout ${tmo}s) ===" | tee -a "$OUT/window.log"
    env "${envs[@]}" timeout "$tmo" "$@" \
        > "$OUT/$name.out" 2> "$OUT/$name.err"
    echo "--- $name rc=$? ---" | tee -a "$OUT/window.log"
    tail -3 "$OUT/$name.out" | tee -a "$OUT/window.log"
}

# 0. stage-3 render FPS on the TRAINED model at native res (VERDICT ask #6:
#    a clean render-compute FPS on a healthy session) — needs
#    point_cloud/iteration_N to exist from the finished training run
run render_fps 3600 NONE=1 -- python render_4DGS.py \
    --input_dir demo/scene_0 --configs arguments/dnerf/hellwarrior.py

# 1. the driver-official scale: 262k pts @ 512^2, with breakdown
#    (also the rehearsal for the driver's own BENCH_r03 run)
run bench_512_262k 1500 MOM_TPU_BENCH_BUDGET=1400 -- python bench.py

# 2. production scale, current default binning (sort)
run bench_720p_sort 2400 MOM_TPU_BENCH_BUDGET=2200 \
    MOM_TPU_BENCH_PTS=921600 MOM_TPU_BENCH_RES=1280x720 \
    MOM_TPU_BENCH_ITERS=12 -- python bench.py

# 3. production scale, MXU counting-sort binning (A/B vs 2)
run bench_720p_radix 2400 MOM_TPU_BENCH_BUDGET=2200 \
    MOM_TPU_BENCH_PTS=921600 MOM_TPU_BENCH_RES=1280x720 \
    MOM_TPU_BENCH_ITERS=12 MOM_TPU_BIN_RADIX=1 -- python bench.py

# 4. driver-official scale with radix binning (A/B vs 1)
run bench_512_radix 1500 MOM_TPU_BENCH_BUDGET=1400 MOM_TPU_BIN_RADIX=1 \
    -- python bench.py

# 5. k-pass bf16 split cumsum A/B at production scale
run bench_720p_split3 2400 MOM_TPU_BENCH_BUDGET=2200 \
    MOM_TPU_BENCH_PTS=921600 MOM_TPU_BENCH_RES=1280x720 \
    MOM_TPU_BENCH_ITERS=12 MOM_TPU_MXU_SPLIT=3 -- python bench.py

# 5b. CHUNK=256 A/B at production scale
run bench_720p_chunk256 2400 MOM_TPU_BENCH_BUDGET=2200 \
    MOM_TPU_BENCH_PTS=921600 MOM_TPU_BENCH_RES=1280x720 \
    MOM_TPU_BENCH_ITERS=12 MOM_TPU_CHUNK=256 -- python bench.py

# 6. band-sharding locality demonstration (TP design, one chip)
run band_locality 1800 NONE=1 -- python tools/band_locality.py \
    921600 1280x720 4 10

echo "window complete; results in $OUT" | tee -a "$OUT/window.log"
