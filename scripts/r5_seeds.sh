#!/bin/bash
# Round-5 statistical-hygiene queue (VERDICT r4 item 8): multi-seed repeats
# of the headline joint proxy so PARITY.md can state mean±σ, and the
# pre-NMS-6000 neutrality claim (config.py train_pre_nms) gets error bars
# instead of a single-run comparison.  Seed 0 rows already exist from r4/r5
# (band 0.585-0.596 across reruns; pre-NMS 6000 -> 0.5951).
# Idempotent via done_<name> markers, same contract as r5_queue.sh.
set -u
LOG=/tmp/r5_exp
mkdir -p "$LOG"
cd /root/repo

run_item() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -e "$LOG/done_$name" ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  local map
  map=$(grep -oE 'mAP = [0-9.]+' "$LOG/$name.log" | tail -1)
  echo "$name rc=$rc ${map:-NO-MAP} $(date -u +%H:%M:%S)" >> "$LOG/RESULTS.txt"
  [ $rc -eq 0 ] && touch "$LOG/done_$name"
}

run_item joint_s1 4000 python scripts/voc_real_anno_proxy.py \
  /tmp/voc_real_proxy joint --tag s1 --train_seed 1
run_item joint_s2 4000 python scripts/voc_real_anno_proxy.py \
  /tmp/voc_real_proxy joint --tag s2 --train_seed 2
run_item joint_s1_pn6k 4000 python scripts/voc_real_anno_proxy.py \
  /tmp/voc_real_proxy joint --tag s1pn6k --train_seed 1 --pre_nms 6000
run_item joint_s2_pn6k 4000 python scripts/voc_real_anno_proxy.py \
  /tmp/voc_real_proxy joint --tag s2pn6k --train_seed 2 --pre_nms 6000

echo "SEEDS QUEUE COMPLETE $(date -u)" >> "$LOG/RESULTS.txt"
