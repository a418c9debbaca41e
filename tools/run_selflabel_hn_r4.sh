#!/bin/bash
# Round-4 descriptor-precision experiment (VERDICT r3 item 5):
# regenerate the iteration-2 self-labels (lost to the environment reset —
# labeled by the ITERATION-1 joint model, exactly as the released i2
# artifact was trained), then train a joint model with the hard-negative-
# mined cosine hinge ('hinge_hn', train/loss.py) on the SAME labels, so
# the differences vs weights/superpoint_joint_r3i2.npz are the descriptor
# loss and the epoch budget (60 vs 100 — wall-clock bound; the reference
# hinge plateaus from ~epoch 50, logs/train_superpoint_i2.log).
# Sequential — the chip claim is exclusive.
set -x
mkdir -p _data/real_corpus_r3i2
ln -sfn ../real_corpus_r3/train2014 _data/real_corpus_r3i2/train2014
ln -sfn ../real_corpus_r3/test2014 _data/real_corpus_r3i2/test2014

timeout 7200 python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r3i2 --generate-points \
    --magic-point-weights weights/superpoint_joint_r3.npz \
    > logs/selflabel_i2_r4.log 2>&1
sleep 30
timeout 14000 python -m feature_point_cnn_tpu.main train \
    --coco-path _data/real_corpus_r3i2 \
    --magic-point-weights weights/magicpoint_synth_r3.npz \
    --checkpoint-path _data/ckpt_superpoint_hn \
    --descriptor-loss hinge_hn --photometric-augment --epochs 60 \
    --snapshot-path weights/superpoint_joint_r4hn.npz \
    > logs/train_superpoint_r4hn.log 2>&1
echo HN_TRAIN_DONE
