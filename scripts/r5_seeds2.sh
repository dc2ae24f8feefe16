#!/bin/bash
# Corrective follow-up to r5_seeds.sh: its pn6k items duplicated the
# production default (config.train_pre_nms is ALREADY 6000 since r3), so the
# pre-NMS neutrality comparison needs the 12000 arm at seeds 1/2 instead.
# Runs after r5_seeds.sh completes, then the loader-fed decomposition probe.
set -u
LOG=/tmp/r5_exp
cd /root/repo

while ! grep -q "SEEDS QUEUE COMPLETE" "$LOG/RESULTS.txt" 2>/dev/null; do sleep 45; done

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

# probe first: it is the round's open investigation (VERDICT #4) and short;
# the pn12k error-bar arms follow with whatever chip time remains
if ! [ -e "$LOG/done_probe" ]; then
  timeout 1200 python scripts/probe_loaderfed.py > "$LOG/probe_loaderfed.log" 2>&1
  echo "PROBE DONE rc=$? $(date -u +%H:%M:%S)" >> "$LOG/RESULTS.txt"
  touch "$LOG/done_probe"
fi

run_item joint_s1_pn12k 4000 python scripts/voc_real_anno_proxy.py \
  /tmp/voc_real_proxy joint --tag s1pn12k --train_seed 1 --pre_nms 12000
run_item joint_s2_pn12k 4000 python scripts/voc_real_anno_proxy.py \
  /tmp/voc_real_proxy joint --tag s2pn12k --train_seed 2 --pre_nms 12000
echo "SEEDS2 COMPLETE $(date -u)" >> "$LOG/RESULTS.txt"
