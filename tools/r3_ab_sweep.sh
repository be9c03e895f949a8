#!/bin/bash
# Round-3 production-scale A/B sweep (run AFTER training frees the chip).
#
# 1. Full bench at 921k/720p with the backward breakdown (default gates)
# 2. A/B each gated optimization at the same scale:
#      MOM_TPU_BIN_RADIX=1   MXU counting-sort binning
#      MOM_TPU_MXU_SPLIT=2   bf16 k-pass compositing cumsum matmul
#      MOM_TPU_CHUNK=256     wider compositing chunks
# Results land in /tmp/ab_sweep/*.json (one bench JSON line each).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/ab_sweep
mkdir -p $OUT

run() {  # name, extra env...
    local name=$1; shift
    echo "=== $name ($(date -u +%H:%M:%S)) ===" >&2
    env MOM_TPU_BENCH_PTS=921600 MOM_TPU_BENCH_RES=1280x720 \
        MOM_TPU_BENCH_BUDGET=${AB_BUDGET:-1500} MOM_TPU_BENCH_ITERS=12 \
        "$@" python bench.py > $OUT/$name.json 2> $OUT/$name.log
    tail -c 600 $OUT/$name.json >&2; echo >&2
}

# baseline w/ breakdown first (the only one that needs the long tail)
run baseline
# gate A/Bs: skip the breakdown time by a tighter budget
AB_BUDGET=900 run radix    MOM_TPU_BIN_RADIX=1
AB_BUDGET=900 run mxusplit MOM_TPU_MXU_SPLIT=2
AB_BUDGET=900 run chunk256 MOM_TPU_CHUNK=256
AB_BUDGET=900 run radix_split MOM_TPU_BIN_RADIX=1 MOM_TPU_MXU_SPLIT=2
# round-3 backward-path gates (scanprims.py / hexplane time matmul)
AB_BUDGET=900 run timemm     MOM_TPU_TIME_MM=1
AB_BUDGET=900 run blockcumsum MOM_TPU_BLOCK_CUMSUM=1
AB_BUDGET=900 run segradix   MOM_TPU_SEG_RADIX=1
AB_BUDGET=900 run bwd_all MOM_TPU_TIME_MM=1 MOM_TPU_BLOCK_CUMSUM=1 \
    MOM_TPU_SEG_RADIX=1
AB_BUDGET=1200 run all_on MOM_TPU_TIME_MM=1 MOM_TPU_BLOCK_CUMSUM=1 \
    MOM_TPU_SEG_RADIX=1 MOM_TPU_BIN_RADIX=1

python - <<'EOF'
import json, glob
print(f"{'config':14} {'it/s':>7} {'step_ms':>8}")
for f in sorted(glob.glob('/tmp/ab_sweep/*.json')):
    try:
        d = json.load(open(f))
        name = f.split('/')[-1][:-5]
        print(f"{name:14} {d['value']:>7} {d['extra'].get('step_ms','?'):>8}")
    except Exception as e:
        print(f, 'unparsed:', e)
EOF
