#!/bin/bash
# Round-3 full-run orchestrator: wait for tunnel liveness, regenerate the
# stage-1 artifacts if missing, then run the full stage-2 schedule under the
# stall watchdog.  Designed to be launched once in the background and left
# alone; all progress goes to /tmp/r3_orch.log.
#
# A wedged tunnel stream needs ~10 min of full client silence before a new
# client can attach reliably (RESULTS.md round-2/3 tunnel notes), hence the
# 600 s quiet periods between probes.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3_orch.log
echo "[orch] start $(date -u)" >> "$LOG"

probe() {
    timeout 300 python -c \
        "import jax; d = jax.devices(); print('ALIVE', d, flush=True)" \
        >> "$LOG" 2>&1
}

until probe; do
    echo "[orch] tunnel unresponsive $(date -u); quiet 600 s" >> "$LOG"
    sleep 600
done
echo "[orch] tunnel alive $(date -u)" >> "$LOG"

# restore banked run state (committed by tools/r3_committer.sh) after a
# VM reset: stage-1 artifacts and the newest full-state checkpoint
if [ ! -f demo/scene_0/MOM/train_data.pth ] \
    && [ -f demo/scene_0/rescue/mom_stage1.tar.gz ]; then
    tar -xzf demo/scene_0/rescue/mom_stage1.tar.gz -C demo/scene_0
    echo "[orch] restored stage-1 MOM from rescue" >> "$LOG"
fi
for gz in demo/scene_0/rescue/chkpnt_*.npz.gz; do
    [ -f "$gz" ] || continue
    tgt=demo/scene_0/$(basename "${gz%.gz}")
    if [ ! -f "$tgt" ]; then
        gunzip -c "$gz" > "$tgt"
        echo "[orch] restored $(basename "$tgt") from rescue" >> "$LOG"
    fi
done

# stage 1 (native res) -- skip when its on-disk contract already exists
if [ ! -f demo/scene_0/MOM/train_data.pth ]; then
    for i in 1 2 3; do
        timeout 7200 python train_motion.py --input_dir demo/scene_0 \
            > /tmp/stage1.log 2>&1 && break
        echo "[orch] stage1 attempt $i failed rc=$?; quiet 600 s" >> "$LOG"
        sleep 600
    done
fi
if [ ! -f demo/scene_0/MOM/train_data.pth ]; then
    echo "[orch] stage1 FAILED, aborting" >> "$LOG"
    exit 1
fi
echo "[orch] stage1 done $(date -u)" >> "$LOG"

# stage 2: coarse 3000 + fine 20000 under the watchdog (hellwarrior config
# is the train_4DGS.py default), full-state checkpoints every 1000 iters
python tools/train_watchdog.py --input_dir demo/scene_0 --expname full_r3 \
    --log /tmp/full_r3.log \
    -- --test_iterations 3000 7000 14000 20000 >> "$LOG" 2>&1
echo "[orch] stage2 watchdog exited rc=$? $(date -u)" >> "$LOG"
