#!/bin/bash
# Round-4 milestone committer: banks long-run evidence into git so a dev-VM
# reset cannot erase a run (round 3 lost four attempts this way).  Handles
# every demo scene, banks full-state rescue checkpoints at a tight stride
# (fine >= 2000, stride 2000 — the round-3 verdict's #5 fix), and also banks
# the actual deliverables (point_cloud/iteration_* exports, frame/vid
# results) the moment they appear.
set -u
cd "$(dirname "$0")/.."
STRIDE=${RESCUE_STRIDE:-2000}
INTERVAL=${INTERVAL:-900}
mkdir -p runlogs

bank_logs() {
    for f in /tmp/r4_orch.log /tmp/stage1_s1.log /tmp/stage1_s2.log \
             /tmp/full_r4.log /tmp/full_r4_s1.log /tmp/full_r4_s2.log; do
        [ -f "$f" ] && cp "$f" runlogs/ 2>/dev/null
    done
    for s in demo/scene_0 demo/scene_1 demo/scene_2; do
        for p in "$s/metrics.jsonl" "$s/cfg_args"; do
            [ -e "$p" ] && git add -f "$p" 2>/dev/null
        done
    done
    git add -f runlogs 2>/dev/null
    true
}

bank_checkpoint() {  # bank_checkpoint <scene_dir>
    local SCENE=$1
    local STATE=/tmp/r4_committer.$(basename "$SCENE").state
    mkdir -p "$SCENE/rescue"
    [ -f "$STATE" ] || echo "-1 coarse" > "$STATE"
    local last_iter last_stage
    read -r last_iter last_stage < "$STATE"
    local best="" best_stage="" best_iter=-1
    for c in "$SCENE"/chkpnt_fine_*.npz "$SCENE"/chkpnt_coarse_*.npz; do
        [ -f "$c" ] || continue
        local b; b=$(basename "$c")
        local stage=${b#chkpnt_}; stage=${stage%%_*}
        local iter=${b##*_}; iter=${iter%.npz}
        local rank=$iter
        [ "$stage" = fine ] && rank=$((iter + 100000))
        local best_rank=$best_iter
        [ "$best_stage" = fine ] && best_rank=$((best_iter + 100000))
        if [ "$rank" -gt "$best_rank" ]; then
            best=$c; best_stage=$stage; best_iter=$iter
        fi
    done
    [ -n "$best" ] || return 0
    # fine checkpoints from iteration 2000 on, stride $STRIDE (VM resets
    # arrive every ~3.5-4h; at ~0.83 it/s a 2000-iter stride caps the loss
    # at ~40 min of progress).  gzip -n so an unchanged checkpoint re-banked
    # produces identical bytes (no spurious 400MB history blobs).
    [ "$best_stage" = fine ] || return 0
    [ "$best_iter" -ge 2000 ] || return 0
    local last_rank=$last_iter
    [ "$last_stage" = fine ] || last_rank=-1
    local final=20000
    [ "$SCENE" = demo/scene_0 ] || final=7000
    if [ $((best_iter - last_rank)) -ge "$STRIDE" ] \
        || { [ "$best_iter" -eq "$final" ] && [ "$best_iter" -ne "$last_iter" ]; }; then
        rm -f "$SCENE"/rescue/chkpnt_*.npz.gz
        gzip -1 -n -c "$best" > "$SCENE/rescue/$(basename "$best").gz" \
            || return 0
        git add -f -A "$SCENE/rescue"
        echo "$best_iter $best_stage" > "$STATE"
        echo "banked $SCENE/$(basename "$best")"
    fi
}

bank_stage1() {  # bank_stage1 <scene_dir>
    local SCENE=$1
    if [ -f "$SCENE/MOM/train_data.pth" ] \
        && [ -f "$SCENE/MOM/scene_flow.pth" ] \
        && [ ! -f "$SCENE/rescue/mom_stage1.tar.gz" ]; then
        mkdir -p "$SCENE/rescue"
        tar -czf "$SCENE/rescue/mom_stage1.tar.gz" \
            --exclude='tran_data.pth' --exclude='Flow_viz' \
            -C "$SCENE" MOM 2>/dev/null || return 0
        git add -f "$SCENE/rescue/mom_stage1.tar.gz"
        echo "banked $SCENE stage-1 MOM artifacts"
    fi
}

bank_deliverables() {  # point_cloud exports + render results, all scenes
    for s in demo/scene_0 demo/scene_1 demo/scene_2; do
        for d in "$s"/point_cloud/iteration_*; do
            [ -d "$d" ] || continue
            # only add once fully written (deformation file present)
            [ -f "$d/deformation.npz" ] || [ -f "$d/deformation.pth" ] || continue
            git add -f "$d" 2>/dev/null
        done
        for d in "$s/vid_result" "$s/frame_result" "$s"/video; do
            [ -d "$d" ] && git add -f "$d" 2>/dev/null
        done
    done
    true
}

while true; do
    bank_logs
    bank_deliverables
    note=""
    for s in demo/scene_0 demo/scene_1 demo/scene_2; do
        n1=$(bank_stage1 "$s")
        n2=$(bank_checkpoint "$s")
        note="${note}${n1:+ + $n1}${n2:+ + $n2}"
    done
    if ! git diff --cached --quiet 2>/dev/null; then
        git commit -q -m "Bank full-run logs/metrics${note}

No-Verification-Needed: run artifacts and logs only" || true
    fi
    sleep "$INTERVAL"
done
