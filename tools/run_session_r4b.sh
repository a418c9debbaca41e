#!/bin/bash
# Round-4 (resumed session) chip queue, priority order after the already-
# running bench.py: the native pipeline/batch sweep first (VERDICT r3
# item 6 — the one still-unlanded mandate), then the hinge_hn descriptor
# experiment (self-labels regenerated deterministically, 60-epoch train),
# then its held-out evals.  Sequential — exclusive chip claim.
set -x
bash tools/run_native_sweep_r4.sh > logs/native_sweep_r4.log 2>&1
sleep 20
bash tools/run_selflabel_hn_r4.sh > logs/selflabel_hn_queue_r4.log 2>&1
sleep 20
timeout 2400 python tools/eval_per_source.py \
    --weights weights/superpoint_joint_r4hn.npz \
    > logs/eval_r4_hn_harsh.log 2>&1
sleep 20
timeout 2400 python tools/eval_per_source.py \
    --weights weights/superpoint_joint_r4hn.npz --mild \
    > logs/eval_r4_hn_mild.log 2>&1
echo SESSION_R4B_QUEUE_DONE
