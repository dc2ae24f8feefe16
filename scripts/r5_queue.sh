#!/bin/bash
# Round-5 quality-evidence matrix (VERDICT r4 items #3 and #8), run
# SEQUENTIALLY on the single tunneled TPU chip.
#
#   bash scripts/r5_queue.sh [start_index]
#
# Between items the queue honors a pause flag: `touch /tmp/r5_exp/PAUSE`
# makes it wait (checked every 30 s) so the chip can be borrowed for perf
# measurements; `rm /tmp/r5_exp/PAUSE` resumes.  Each item logs to
# /tmp/r5_exp/<name>.log and appends a one-line summary to
# /tmp/r5_exp/RESULTS.txt.
set -u
LOG=/tmp/r5_exp
mkdir -p "$LOG"
cd /root/repo

run_item() {
  local name="$1"; shift
  local tmo="$1"; shift
  while [ -e "$LOG/PAUSE" ]; do sleep 30; done
  if [ -e "$LOG/done_$name" ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: $(date -u +%H:%M:%S) ==="
  timeout "$tmo" python scripts/voc_real_anno_proxy.py "$@" \
      > "$LOG/$name.log" 2>&1
  local rc=$?
  local map
  map=$(grep -oE 'mAP = [0-9.]+' "$LOG/$name.log" | tail -1)
  echo "$name rc=$rc ${map:-NO-MAP} $(date -u +%H:%M:%S)" >> "$LOG/RESULTS.txt"
  [ $rc -eq 0 ] && touch "$LOG/done_$name"
}

START=${1:-0}
i=0
next() { i=$((i+1)); [ $i -gt $START ]; }

# --- multi-seed joint (seed 0 = round-4: 0.5960 r3 / 0.5847 r4 rerun) ---
next && run_item joint_seed1 4500 /tmp/voc_real_proxy joint \
  --train_seed 1 --tag seed1
next && run_item joint_seed2 4500 /tmp/voc_real_proxy joint \
  --train_seed 2 --tag seed2

# --- backbone matrix at VOC geometry (corruption check included) ---
next && run_item joint_vgg16 6000 /tmp/voc_real_proxy joint \
  --network vgg16 --tag vgg16 --inject_bug
next && run_item joint_r101 7000 /tmp/voc_real_proxy joint \
  --network resnet101 --tag r101 --inject_bug

# --- KITTI headline geometry: R50, 600x1500, anchors 16..512, 9 classes ---
next && run_item joint_kitti 7000 /tmp/kitti_proxy joint \
  --kitti_synth --resize_dims 600,1500 --tag kitti --inject_bug

# --- 4-step multi-seed at reference per-step-full-schedule semantics ---
next && run_item fourstep_seed1 9000 /tmp/voc_real_proxy all \
  --train_seed 1 --tag s4seed1

# --- pre-NMS 12000 vs 6000 neutrality, with seed spread ---
next && run_item pre12k_seed1 4500 /tmp/voc_real_proxy joint \
  --train_seed 1 --pre_nms 12000 --tag p12ks1
next && run_item pre12k_seed2 4500 /tmp/voc_real_proxy joint \
  --train_seed 2 --pre_nms 12000 --tag p12ks2

# --- 3rd 4-step seed last (least marginal value if time runs out) ---
next && run_item fourstep_seed2 9000 /tmp/voc_real_proxy all \
  --train_seed 2 --tag s4seed2

echo "QUEUE COMPLETE $(date -u)" >> "$LOG/RESULTS.txt"
