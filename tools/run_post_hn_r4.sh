#!/bin/bash
# Round-4 post-training queue: held-out evals of the hinge_hn joint model
# (harsh + mild families, same protocol as the i1/i2 tables), then the
# native serving sweep.  Sequential — the chip claim is exclusive.
set -x
timeout 2400 python tools/eval_per_source.py \
    --weights weights/superpoint_joint_r4hn.npz \
    > logs/eval_r4_hn_harsh.log 2>&1
sleep 30
timeout 2400 python tools/eval_per_source.py \
    --weights weights/superpoint_joint_r4hn.npz --mild \
    > logs/eval_r4_hn_mild.log 2>&1
sleep 30
bash tools/run_native_sweep_r4.sh > logs/native_sweep_r4.log 2>&1
echo POST_HN_DONE
