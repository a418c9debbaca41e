#!/bin/bash
# Host-side eval watcher for the round-5 post-reset A/B arms: as each
# arm's snapshot lands (written by the chip queue's per-epoch snapshot
# path), run the held-out harsh + mild evals ON CPU (tools/eval_cpu.py)
# so the chip stays free for perf stages.  Sequential — concurrent XLA
# CPU evals would fight over host cores.
# Usage: bash tools/run_cpu_evals_r5.sh  (run on the host, NOT the chip)
set -u
cd /root/repo
for tag in ctl hn aug; do
  W="weights/superpoint_joint_r5${tag}.npz"
  for _ in $(seq 1 360); do  # wait up to 1 h per arm
    [ -f "$W" ] && break
    [ -f tools/STOP_QUEUES ] && exit 0
    sleep 10
  done
  if [ ! -f "$W" ]; then
    echo "[cpu-evals] $W never appeared - skipping $tag"
    continue
  fi
  # snapshots are written atomically per epoch but training may still be
  # running; wait until the arm's final-epoch line (epoch 15 for --epochs 16) is in its train log so
  # the eval sees the completed-schedule snapshot
  LOG="logs/train_superpoint_r5${tag}.log"
  for _ in $(seq 1 360); do
    grep -q "epoch 15 test" "$LOG" 2>/dev/null && break
    [ -f tools/STOP_QUEUES ] && break
    sleep 10
  done
  echo "[cpu-evals] evaluating $tag ($W)"
  timeout 1800 python tools/eval_cpu.py --weights "$W" \
      > "logs/eval_r5_${tag}_harsh.log" 2>&1
  timeout 1800 python tools/eval_cpu.py --weights "$W" --mild \
      > "logs/eval_r5_${tag}_mild.log" 2>&1
done
echo CPU_EVALS_DONE
