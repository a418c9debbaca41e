#!/bin/bash
# Round-5 helper: when the ctl train reaches the epoch the hn train ended
# at, copy the per-epoch snapshot to a matched-epoch artifact so the
# descriptor-loss A/B compares EQUAL training budgets
# (weights/superpoint_joint_r5ctl_epE.npz).
# Usage: watch_ctl_epoch.sh <hn_final_epoch>
set -u
E=$1
OUT="weights/superpoint_joint_r5ctl_ep${E}.npz"
for _ in $(seq 1 720); do  # up to 2 h
  if [ -f "$OUT" ]; then exit 0; fi
  # epoch E's snapshot is written between its test line and epoch E+1's
  # first log line; trigger on the latter so the copy can't race the save
  # (save_weights renames atomically, so cp always sees a complete file)
  if grep -q "=== superpoint epoch $((E + 1)) ===" \
      logs/train_superpoint_r5ctl.log 2>/dev/null; then
    cp weights/superpoint_joint_r5ctl.npz "$OUT"
    echo "[watch] copied ctl epoch-${E} snapshot -> $OUT"
    exit 0
  fi
  sleep 10
done
echo "[watch] gave up waiting for ctl epoch ${E}"
exit 1
