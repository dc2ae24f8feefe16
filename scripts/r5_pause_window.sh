#!/bin/bash
# Round-5 pause-window work: runs while r5_queue.sh is PAUSEd.
#  1. wait for the in-flight r101 item to finish;
#  2. VGG16 quality retry at batch 8 (B=16 OOMs: 0.5 GB f32 fc params +
#     optimizer state + all-blocks-trainable activations next to the
#     4.7 GB HBM dataset cache), phases doubled so the images seen match
#     the B=16 runs;
#  3. short loader-fed (non-device-cache) R50 joint run for the VERDICT
#     r4 #4 integration evidence — measures sustained img/s of
#     TrainLoader -> H2D -> train_step through the dev tunnel;
#  4. resume the queue.
set -u
LOG=/tmp/r5_exp
cd /root/repo

# 1. wait for r101 (RESULTS line appears when run_item returns)
while ! grep -q joint_r101 "$LOG/RESULTS.txt"; do sleep 30; done

# 2. vgg16 @ B=8
if ! grep -q "joint_vgg16_b8 rc=0" "$LOG/RESULTS.txt"; then
  rm -rf /tmp/voc_real_proxy/work_joint_vgg16 /tmp/voc_real_proxy/dets_joint_vgg16_*
  timeout 9000 python scripts/voc_real_anno_proxy.py /tmp/voc_real_proxy joint \
      --network vgg16 --tag vgg16 --inject_bug \
      --batch 8 --phases 2600:1e-3,800:1e-4 \
      > "$LOG/joint_vgg16_b8.log" 2>&1
  rc=$?
  map=$(grep -oE 'mAP = [0-9.]+' "$LOG/joint_vgg16_b8.log" | head -1)
  echo "joint_vgg16_b8 rc=$rc ${map:-NO-MAP} $(date -u +%H:%M:%S)" >> "$LOG/RESULTS.txt"
fi

# 3. loader-fed R50 short leg (150 steps is enough for a sustained rate;
#    fresh workdir so auto-resume can't skip steps)
rm -rf /tmp/loaderfed
timeout 3000 python -m faster_rcnn_tpu.cli.train \
    --step joint --voc_paths /tmp/voc_real_proxy/VOC --img_set train \
    --phases 150:1e-3 --batch_size 16 --freeze_blocks none \
    --clip_grad_norm 10 --workdir /tmp/loaderfed --save_frequency 1000 \
    > "$LOG/loaderfed.log" 2>&1
rc=$?
rate=$(grep -oE '\([0-9.]+ img/s\)' "$LOG/loaderfed.log" | tail -1)
echo "loaderfed_r50 rc=$rc ${rate:-NO-RATE} $(date -u +%H:%M:%S)" >> "$LOG/RESULTS.txt"

# 4. resume queue
rm -f "$LOG/PAUSE"
echo "PAUSE-WINDOW COMPLETE $(date -u)" >> "$LOG/RESULTS.txt"
