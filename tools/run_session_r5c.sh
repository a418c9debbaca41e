#!/bin/bash
# Round-5 end-game chip queue (launched after run_session_r5.sh completes).
# Experimental design anchored on ctl@60 (reference hinge, i2 labels):
#   - hn@E vs ctl@E         isolates the descriptor loss (equal budget)
#   - aug@60 vs ctl@60      isolates photometric augmentation (in r5 queue)
#   - i3 vs ctl@matched     isolates the third adaptation round
# Priority order: matched-epoch ctl eval -> r5b (bench/profile/tracking/u8)
# -> i3 labeling -> i3 train -> i3 eval.  Every stage under timeout, gated
# on STOP_QUEUES AND an absolute deadline (DEADLINE_EPOCH, unix seconds):
# a stage does not START past the deadline, so the chip is always free for
# the driver's end-of-round bench.
# Usage: DEADLINE_EPOCH=$(date -d '23:40' +%s) run_session_r5c.sh <hn_final_epoch>
set -x
cd /root/repo
E=${1:?need hn final epoch}
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (unix seconds)}

gate() {
  if [ -f tools/STOP_QUEUES ]; then
    echo "[queue] STOP_QUEUES present - exiting before stage $1"
    exit 0
  fi
  if [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
    echo "[queue] deadline passed - exiting before stage $1"
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

gate r5b
bash tools/run_session_r5b.sh > logs/session_r5b_queue.log 2>&1
sleep 10

gate selflabel_i3
# third adaptation round: label the corpus with the RELEASED i2 model
mkdir -p _data/real_corpus_r5i3
ln -sfn ../real_corpus_r3/train2014 _data/real_corpus_r5i3/train2014
ln -sfn ../real_corpus_r3/test2014 _data/real_corpus_r5i3/test2014
timeout 4500 python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r5i3 --generate-points \
    --magic-point-weights "weights/$(cat weights/RELEASED)" \
    > logs/selflabel_i3_r5.log 2>&1
sleep 10

gate train_i3
# same recipe as ctl, 30-epoch wall-bound budget (matched ctl@30 snapshot
# from watch_ctl_epoch.sh 30); --steps-per-call 8 also measures the
# round-5 scan-training feature at real scale.  The per-epoch snapshot
# makes ANY cutoff epoch a usable artifact.
T_LEFT=$(( DEADLINE_EPOCH - $(date +%s) - 1500 ))  # leave room for the eval
[ "$T_LEFT" -gt 3600 ] && T_LEFT=3600
if [ "$T_LEFT" -gt 600 ]; then
  timeout "$T_LEFT" python -m feature_point_cnn_tpu.main train \
      --coco-path _data/real_corpus_r5i3 \
      --magic-point-weights weights/magicpoint_synth_r3.npz \
      --checkpoint-path _data/ckpt_superpoint_i3 \
      --epochs 30 --steps-per-call 8 \
      --snapshot-path weights/superpoint_joint_r5i3.npz \
      > logs/train_superpoint_r5i3.log 2>&1
  sleep 10
fi

gate eval_i3
if [ -f weights/superpoint_joint_r5i3.npz ]; then
  timeout 1500 python tools/eval_per_source.py \
      --weights weights/superpoint_joint_r5i3.npz \
      > logs/eval_r5_i3_harsh.log 2>&1
fi

echo SESSION_R5C_QUEUE_DONE
