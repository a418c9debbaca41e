#!/bin/bash
# Round-4 final chip queue, priority order: the driver-captured benchmark
# first, then the hinge_hn held-out evals (compile-cache-warm, fast), then
# the native serving sweep (longest).  Sequential — exclusive chip claim.
set -x
timeout 2400 python bench.py > logs/bench_r4_final.log 2>&1
sleep 20
timeout 2400 python tools/eval_per_source.py \
    --weights weights/superpoint_joint_r4hn.npz \
    > logs/eval_r4_hn_harsh.log 2>&1
sleep 20
timeout 2400 python tools/eval_per_source.py \
    --weights weights/superpoint_joint_r4hn.npz --mild \
    > logs/eval_r4_hn_mild.log 2>&1
sleep 20
bash tools/run_native_sweep_r4.sh > logs/native_sweep_r4.log 2>&1
echo FINAL_QUEUE_DONE
