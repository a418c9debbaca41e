#!/bin/bash
# Round-4 held-out quality evals: the pinned i2 artifact vs iteration 1,
# each on the harsh (reference-distribution) and mild (HPatches-like) warp
# families.  Sequential — the chip claim is exclusive.  Run on an idle host
# (concurrent CPU load inflates relay timings; see memory notes) — quality
# metrics are timing-free, but the runs still hold the chip.
set -x
timeout 2400 python tools/eval_per_source.py \
    > logs/eval_r4_i2_harsh.log 2>&1
sleep 30
timeout 2400 python tools/eval_per_source.py --mild \
    > logs/eval_r4_i2_mild.log 2>&1
sleep 30
timeout 2400 python tools/eval_per_source.py \
    --weights weights/superpoint_joint_r3.npz \
    > logs/eval_r4_i1_harsh.log 2>&1
sleep 30
timeout 2400 python tools/eval_per_source.py \
    --weights weights/superpoint_joint_r3.npz --mild \
    > logs/eval_r4_i1_mild.log 2>&1
echo EVALS_DONE
