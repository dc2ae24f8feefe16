#!/bin/bash
# Round-5 follow-up queue: waits for r5_queue.sh to finish (QUEUE COMPLETE
# marker in RESULTS.txt), then runs the retries/controls the first pass
# showed were needed:
#   1. KITTI-geometry retry with the device cache capped at 800 records
#      (1500 x 608x1504x3 uint8 = 4.2 GB OOM'd the chip next to
#      activations; 800 = 2.2 GB, same as the VOC cache);
#   2. R50 control at the VGG16 retry schedule (B=8, 2600+800 steps) so the
#      vgg16 0.8455 row is comparable to something — B=8 doubles the
#      gradient-update count at equal samples seen;
#   3. H2D/dispatch tunnel microbench to decompose the loader-fed 28 img/s.
# Same idempotence contract as r5_queue.sh (done_<name> markers, PAUSE flag).
set -u
LOG=/tmp/r5_exp
mkdir -p "$LOG"
cd /root/repo

while ! grep -q "QUEUE COMPLETE" "$LOG/RESULTS.txt"; do sleep 60; done

run_item() {
  local name="$1"; shift
  local tmo="$1"; shift
  while [ -e "$LOG/PAUSE" ]; do sleep 30; done
  if [ -e "$LOG/done_$name" ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  local map
  map=$(grep -oE 'mAP = [0-9.]+' "$LOG/$name.log" | tail -1)
  echo "$name rc=$rc ${map:-NO-MAP} $(date -u +%H:%M:%S)" >> "$LOG/RESULTS.txt"
  [ $rc -eq 0 ] && touch "$LOG/done_$name"
}

run_item joint_kitti800 8000 python scripts/voc_real_anno_proxy.py \
  /tmp/kitti_proxy800 joint --kitti_synth --limit 800 \
  --resize_dims 600,1500 --tag kitti --inject_bug

# OOM fallback: half the batch, doubled phases (same samples seen)
if ! [ -e "$LOG/done_joint_kitti800" ]; then
  run_item joint_kitti800_b8 9000 python scripts/voc_real_anno_proxy.py \
    /tmp/kitti_proxy800 joint --kitti_synth --limit 800 \
    --resize_dims 600,1500 --tag kitti --inject_bug \
    --batch 8 --phases 2600:1e-3,800:1e-4
fi

run_item joint_r50_b8 8000 python scripts/voc_real_anno_proxy.py \
  /tmp/voc_real_proxy joint --tag r50b8 \
  --batch 8 --phases 2600:1e-3,800:1e-4

run_item h2d_tunnel 900 python scripts/bench_h2d_tunnel.py

echo "QUEUE2 COMPLETE $(date -u)" >> "$LOG/RESULTS.txt"
