#!/bin/bash
# Round-5 end-game chip queue (launched after run_session_r5.sh completes).
# Experimental design anchored on ctl@60 (reference hinge, i2 labels):
#   - hn@E vs ctl@E         isolates the descriptor loss (equal budget)
#   - aug@60 vs ctl@60      isolates photometric augmentation (in r5 queue)
#   - i3@60 vs ctl@60       isolates the third adaptation round
# Order: matched-epoch eval -> i3 labeling -> r5b (bench/profile/tracking/
# u8) -> i3 train -> i3 eval.  Every stage under timeout + STOP_QUEUES gate.
# Usage: run_session_r5c.sh <hn_final_epoch>
set -x
cd /root/repo
E=${1:?need hn final epoch}

gate() {
  if [ -f tools/STOP_QUEUES ]; then
    echo "[queue] STOP_QUEUES present - exiting before stage $1"
    exit 0
  fi
}

gate eval_ctl_matched
if [ -f "weights/superpoint_joint_r5ctl_ep${E}.npz" ]; then
  timeout 2400 python tools/eval_per_source.py \
      --weights "weights/superpoint_joint_r5ctl_ep${E}.npz" \
      > "logs/eval_r5_ctlep${E}_harsh.log" 2>&1
  sleep 10
fi

gate selflabel_i3
# third adaptation round: label the corpus with the RELEASED i2 model
mkdir -p _data/real_corpus_r5i3
ln -sfn ../real_corpus_r3/train2014 _data/real_corpus_r5i3/train2014
ln -sfn ../real_corpus_r3/test2014 _data/real_corpus_r5i3/test2014
timeout 7200 python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r5i3 --generate-points \
    --magic-point-weights "weights/$(cat weights/RELEASED)" \
    > logs/selflabel_i3_r5.log 2>&1
sleep 10

bash tools/run_session_r5b.sh > logs/session_r5b_queue.log 2>&1

gate train_i3
# same recipe as ctl, 40-epoch budget (wall-clock bound at round end; the
# matched ctl@40 snapshot comes from watch_ctl_epoch.sh 40);
# --steps-per-call 8 also measures the round-5 scan-training feature at
# real scale (parity-tested on CPU)
timeout 4200 python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r5i3 \
    --magic-point-weights weights/magicpoint_synth_r3.npz \
    --checkpoint-path _data/ckpt_superpoint_i3 \
    --epochs 40 --steps-per-call 8 \
    --snapshot-path weights/superpoint_joint_r5i3.npz \
    > logs/train_superpoint_r5i3.log 2>&1
sleep 10

gate eval_i3
if [ -f weights/superpoint_joint_r5i3.npz ]; then
  timeout 2400 python tools/eval_per_source.py \
      --weights weights/superpoint_joint_r5i3.npz \
      > logs/eval_r5_i3_harsh.log 2>&1
fi

echo SESSION_R5C_QUEUE_DONE
