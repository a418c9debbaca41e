#!/bin/bash
# Round-5 final chip sequence, adapted to the environment's host-memory
# leak (every train process is OOM-killed after ~12-15 epochs; see
# RESULTS.md round-5 "relay-client host leak"): each model gets ONE
# process lifetime on the SAME 60-epoch LR schedule — equal budgets by
# construction — and the per-epoch snapshot is the artifact.
#   aug train -> i3 selflabel -> i3 train -> evals -> r5b (bench/profile/
#   tracking/u8)
# Stages gated on STOP_QUEUES + DEADLINE_EPOCH like r5c.
set -x
cd /root/repo
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (unix seconds)}

gate() {
  if [ -f tools/STOP_QUEUES ]; then
    echo "[queue] STOP_QUEUES present - exiting before stage $1"; exit 0
  fi
  if [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
    echo "[queue] deadline passed - exiting before stage $1"; exit 0
  fi
}

gate train_aug
timeout 4500 python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r3i2 \
    --magic-point-weights weights/magicpoint_synth_r3.npz \
    --checkpoint-path _data/ckpt_superpoint_aug \
    --photometric-augment --epochs 60 \
    --snapshot-path weights/superpoint_joint_r5aug.npz \
    > logs/train_superpoint_r5aug.log 2>&1
sleep 10

gate selflabel_i3
mkdir -p _data/real_corpus_r5i3
ln -sfn ../real_corpus_r3/train2014 _data/real_corpus_r5i3/train2014
ln -sfn ../real_corpus_r3/test2014 _data/real_corpus_r5i3/test2014
timeout 4500 python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r5i3 --generate-points \
    --magic-point-weights "weights/$(cat weights/RELEASED)" \
    > logs/selflabel_i3_r5.log 2>&1
sleep 10

gate train_i3
timeout 4500 python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r5i3 \
    --magic-point-weights weights/magicpoint_synth_r3.npz \
    --checkpoint-path _data/ckpt_superpoint_i3 \
    --epochs 60 \
    --snapshot-path weights/superpoint_joint_r5i3.npz \
    > logs/train_superpoint_r5i3.log 2>&1
sleep 10

# ---- evals: harsh for every artifact, mild for ctl + hn ----------------
for spec in \
    "hn:weights/superpoint_joint_r4hn.npz:harsh" \
    "hn:weights/superpoint_joint_r4hn.npz:mild" \
    "ctl:weights/superpoint_joint_r5ctl.npz:harsh" \
    "ctl:weights/superpoint_joint_r5ctl.npz:mild" \
    "ctl12:weights/superpoint_joint_r5ctl_ep12.npz:harsh" \
    "aug:weights/superpoint_joint_r5aug.npz:harsh" \
    "i3:weights/superpoint_joint_r5i3.npz:harsh" \
  ; do
  IFS=: read -r tag w fam <<< "$spec"
  gate "eval_${tag}_${fam}"
  if [ -f "$w" ]; then
    flag=""
    [ "$fam" = mild ] && flag="--mild"
    timeout 2400 python tools/eval_per_source.py --weights "$w" $flag \
        > "logs/eval_r5_${tag}_${fam}.log" 2>&1
    sleep 10
  else
    echo "[queue] $w missing - skipping ${tag} ${fam}"
  fi
done

gate r5b
bash tools/run_session_r5b.sh > logs/session_r5b_queue.log 2>&1

echo SESSION_R5D_QUEUE_DONE
