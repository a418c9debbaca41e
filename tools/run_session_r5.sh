#!/bin/bash
# Round-5 chip queue — sequential (the axon chip claim is EXCLUSIVE).
#
# VERDICT r4 mandates, in order:
#   0. fresh driver-format bench with the hardened early-print bench.py
#   1. native serving sweep to completion (item 3)
#   2. finish the interrupted i2 self-label regeneration (resume support)
#   3. hinge_hn 60-epoch train on those labels (item 2, NO aug: clean
#      attribution to the loss)
#   4. 60-epoch reference-hinge control on the SAME labels (anchors both
#      A/Bs: hn-vs-control isolates the loss, aug-vs-control isolates aug)
#   5. 60-epoch reference-hinge + photometric aug (item 5 second half)
#   6. held-out evals (harsh + mild) for every new artifact
#
# Every stage is wrapped in `timeout` and gated on tools/STOP_QUEUES —
# touch that file and the queue exits at the next stage boundary (round-4's
# lost benchmark was caused by a queue still holding the chip when the
# driver ran; this queue can always be stopped without pattern-kills).
set -x
cd /root/repo

gate() {
  if [ -f tools/STOP_QUEUES ]; then
    echo "[queue] STOP_QUEUES present - exiting before stage $1"
    exit 0
  fi
}

mkdir -p logs

gate bench
BENCH_BUDGET_S=900 timeout 1500 python bench.py > logs/bench_r5_start.log 2>&1
sleep 10

gate native_sweep
bash tools/run_native_sweep_r4.sh > logs/native_sweep_r5.log 2>&1
sleep 10

gate profile
# fresh stage roofline with the round-5 NMS kernel restructure
timeout 2400 python tools/profile_serving.py > logs/profile_serving_r5.log 2>&1
sleep 10

gate selflabel
# resume: 3360/8000 items already labeled in round 4; skip_existing labels
# only the remainder (per-item keys keep the stream deterministic)
mkdir -p _data/real_corpus_r3i2
ln -sfn ../real_corpus_r3/train2014 _data/real_corpus_r3i2/train2014
ln -sfn ../real_corpus_r3/test2014 _data/real_corpus_r3i2/test2014
timeout 9000 python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r3i2 --generate-points \
    --magic-point-weights weights/superpoint_joint_r3.npz \
    > logs/selflabel_i2_r5.log 2>&1
sleep 10

gate train_hn
timeout 6000 python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r3i2 \
    --magic-point-weights weights/magicpoint_synth_r3.npz \
    --checkpoint-path _data/ckpt_superpoint_hn \
    --descriptor-loss hinge_hn --epochs 60 \
    --snapshot-path weights/superpoint_joint_r4hn.npz \
    > logs/train_superpoint_r5hn.log 2>&1
sleep 10

gate train_control
timeout 6000 python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r3i2 \
    --magic-point-weights weights/magicpoint_synth_r3.npz \
    --checkpoint-path _data/ckpt_superpoint_ctl \
    --epochs 60 \
    --snapshot-path weights/superpoint_joint_r5ctl.npz \
    > logs/train_superpoint_r5ctl.log 2>&1
sleep 10

gate train_aug
timeout 6000 python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r3i2 \
    --magic-point-weights weights/magicpoint_synth_r3.npz \
    --checkpoint-path _data/ckpt_superpoint_aug \
    --photometric-augment --epochs 60 \
    --snapshot-path weights/superpoint_joint_r5aug.npz \
    > logs/train_superpoint_r5aug.log 2>&1
sleep 10

for tag in hn ctl aug; do
  case $tag in
    hn)  W=weights/superpoint_joint_r4hn.npz ;;
    ctl) W=weights/superpoint_joint_r5ctl.npz ;;
    aug) W=weights/superpoint_joint_r5aug.npz ;;
  esac
  gate "eval_$tag"
  if [ -f "$W" ]; then
    timeout 2400 python tools/eval_per_source.py --weights "$W" \
        > "logs/eval_r5_${tag}_harsh.log" 2>&1
    sleep 10
    timeout 2400 python tools/eval_per_source.py --weights "$W" --mild \
        > "logs/eval_r5_${tag}_mild.log" 2>&1
    sleep 10
  else
    echo "[queue] $W missing - skipping evals for $tag"
  fi
done

gate bench_final
BENCH_BUDGET_S=900 timeout 1500 python bench.py > logs/bench_r5_final.log 2>&1

echo SESSION_R5_QUEUE_DONE
