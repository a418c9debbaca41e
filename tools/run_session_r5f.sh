#!/bin/bash
# Round-5 post-reset chip queue, part 2.  The r5e queue is wound down via
# STOP_QUEUES after its hn train: the held-out quality evals moved OFF the
# chip (they are platform-insensitive and ~4 min on host CPU — the
# released-weights CPU rerun agreed with the round-4 chip numbers to eval
# noise, logs/eval_r5_released_cpu_harsh.log), freeing the chip budget for
# the perf stages the original schedule would have cut:
#   1. uint8/grayscale ABI exports + native sweep A/B (VERDICT r4 item 4c)
#   2. pose-graph tracking eval (VERDICT r4 item 7)
#   3. photometric-aug arm (VERDICT r4 item 5) if budget remains
# Usage: DEADLINE_EPOCH=<unix seconds> bash tools/run_session_r5f.sh
set -x
cd /root/repo
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (unix seconds)}
BIN=${BIN:-/tmp/build_csrc/superpoint_serve}

gate() {
  if [ -f tools/STOP_QUEUES ]; then
    echo "[queue] STOP_QUEUES present - exiting before stage $1"; exit 0
  fi
  if [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
    echo "[queue] deadline passed - exiting before stage $1"; exit 0
  fi
}

REL="weights/$(cat weights/RELEASED)"

gate export_u8
for b in 1 32; do
  batch_flag=""
  [ "$b" != 1 ] && batch_flag="--batch $b"
  timeout 900 python -m feature_point_cnn_tpu.main export \
      --weights-path "$REL" \
      --pjrt-out "_exports/joint_r5_packed_b${b}_u8gray" \
      --abi packed --top-n 256 $batch_flag --fold-bn \
      --input-dtype u8 --gray >> logs/export_u8_r5.log 2>&1
  sleep 5
done

gate native_u8_b1
timeout 900 "$BIN" --model _exports/joint_r5_packed_b1_u8gray \
    --frames 40 --pipeline 1,2,4,8 > logs/native_u8_b1_r5.log 2>&1
sleep 5
gate native_u8_b32
timeout 900 "$BIN" --model _exports/joint_r5_packed_b32_u8gray \
    --frames 12 --pipeline 1,2 > logs/native_u8_b32_r5.log 2>&1
sleep 5

gate tracking_pg
timeout 1200 python -m feature_point_cnn_tpu.eval.tracking \
    --weights-path "$REL" \
    --frames 200 --loops 3 --max-shift 40 \
    --posegraph > logs/tracking_r5_pg.log 2>&1
sleep 5

gate train_aug
T_LEFT=$(( DEADLINE_EPOCH - $(date +%s) ))
[ "$T_LEFT" -gt 1500 ] && T_LEFT=1500
if [ "$T_LEFT" -gt 300 ]; then
  timeout "$T_LEFT" bash tools/train_chunked.sh 15 logs/train_superpoint_r5aug.log \
    python -m feature_point_cnn_tpu.main train \
      --coco-path _data/real_corpus_r3i2 \
      --magic-point-weights weights/magicpoint_synth_r3.npz \
      --checkpoint-path _data/ckpt_superpoint_aug \
      --photometric-augment --epochs 16 --steps-per-call 8 \
      --snapshot-path weights/superpoint_joint_r5aug.npz
fi

echo SESSION_R5F_QUEUE_DONE
