#!/bin/bash
# Round-5 post-reset chip queue.  The mid-round environment reset destroyed
# every ephemeral artifact (corpus, orbax checkpoints, exports, native
# build); this queue re-lands the round's chip deliverables inside the
# remaining wall budget, highest value first:
#   1. fresh driver-format bench (cited round-5 perf log)
#   2. i2 self-labeling of a 3200-item train subset (reduced scale: the
#      full 8000-item labeling alone would eat half the remaining budget)
#   3. matched-budget descriptor-loss A/B: reference hinge control vs
#      hinge_hn, SAME labels, SAME 16-epoch cosine schedule (VERDICT r4
#      item 2) — chunked-resume wrapper absorbs the host-leak OOM kills
#   4. held-out harsh evals for both arms
#   5. uint8/grayscale ABI exports + native sweep A/B (VERDICT r4 item 4c)
#   6. pose-graph tracking eval (VERDICT r4 item 7)
#   7. photometric-aug arm (VERDICT r4 item 5) if budget remains
# Every stage runs under timeout and is gated on tools/STOP_QUEUES AND an
# absolute deadline so the chip is always free for the driver's
# end-of-round bench (the round-4 failure mode).
# Usage: DEADLINE_EPOCH=<unix seconds> bash tools/run_session_r5e.sh
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

gate bench
BENCH_BUDGET_S=420 timeout 700 python bench.py > logs/bench_r5e.log 2>&1
sleep 5

gate selflabel
# the host-side corpus regeneration writes sources.json LAST — wait for it
# so labeling never sees a partially-written train2014 file list
for _ in $(seq 1 180); do
  [ -f _data/real_corpus_r3/sources.json ] && break
  sleep 10
done
[ -f _data/real_corpus_r3/sources.json ] || { echo "[queue] corpus regen never finished"; exit 1; }
mkdir -p _data/real_corpus_r3i2
ln -sfn ../real_corpus_r3/train2014 _data/real_corpus_r3i2/train2014
ln -sfn ../real_corpus_r3/test2014 _data/real_corpus_r3i2/test2014
timeout 2400 python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r3i2 --generate-points --limit 3200 \
    --magic-point-weights weights/superpoint_joint_r3.npz \
    > logs/selflabel_i2_r5e.log 2>&1
sleep 5

gate train_ctl
timeout 1500 bash tools/train_chunked.sh 15 logs/train_superpoint_r5ctl.log \
  python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r3i2 \
    --magic-point-weights weights/magicpoint_synth_r3.npz \
    --checkpoint-path _data/ckpt_superpoint_ctl \
    --epochs 16 --steps-per-call 8 \
    --snapshot-path weights/superpoint_joint_r5ctl.npz
sleep 5

gate train_hn
timeout 2700 bash tools/train_chunked.sh 15 logs/train_superpoint_r5hn.log \
  python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r3i2 \
    --magic-point-weights weights/magicpoint_synth_r3.npz \
    --checkpoint-path _data/ckpt_superpoint_hn \
    --descriptor-loss hinge_hn --epochs 16 \
    --snapshot-path weights/superpoint_joint_r5hn.npz
sleep 5

for tag in ctl hn; do
  gate "eval_$tag"
  W="weights/superpoint_joint_r5${tag}.npz"
  if [ -f "$W" ]; then
    timeout 1200 python tools/eval_per_source.py --weights "$W" \
        > "logs/eval_r5_${tag}_harsh.log" 2>&1
    sleep 5
  else
    echo "[queue] $W missing - skipping eval_$tag"
  fi
done

gate export_u8
REL="weights/$(cat weights/RELEASED)"
for b in 1 32; do
  batch_flag=""
  [ "$b" != 1 ] && batch_flag="--batch $b"
  timeout 1500 python -m feature_point_cnn_tpu.main export \
      --weights-path "$REL" \
      --pjrt-out "_exports/joint_r5_packed_b${b}_u8gray" \
      --abi packed --top-n 256 $batch_flag --fold-bn \
      --input-dtype u8 --gray >> logs/export_u8_r5.log 2>&1
  sleep 5
done

gate native_u8
timeout 1200 "$BIN" --model _exports/joint_r5_packed_b1_u8gray \
    --frames 40 --pipeline 1,2,4,8 > logs/native_u8_b1_r5.log 2>&1
sleep 5
gate native_u8_b32
timeout 1200 "$BIN" --model _exports/joint_r5_packed_b32_u8gray \
    --frames 12 --pipeline 1,2 > logs/native_u8_b32_r5.log 2>&1
sleep 5

gate tracking_pg
timeout 1500 python -m feature_point_cnn_tpu.eval.tracking \
    --weights-path "weights/$(cat weights/RELEASED)" \
    --source _data/real_corpus_r3/test2014 \
    --frames 200 --loops 3 --max-shift 40 \
    --posegraph > logs/tracking_r5_pg.log 2>&1
sleep 5

gate train_aug
timeout 1500 bash tools/train_chunked.sh 15 logs/train_superpoint_r5aug.log \
  python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r3i2 \
    --magic-point-weights weights/magicpoint_synth_r3.npz \
    --checkpoint-path _data/ckpt_superpoint_aug \
    --photometric-augment --epochs 16 --steps-per-call 8 \
    --snapshot-path weights/superpoint_joint_r5aug.npz
sleep 5

gate eval_aug
if [ -f weights/superpoint_joint_r5aug.npz ]; then
  timeout 1200 python tools/eval_per_source.py \
      --weights weights/superpoint_joint_r5aug.npz \
      > logs/eval_r5_aug_harsh.log 2>&1
fi

echo SESSION_R5E_QUEUE_DONE
