#!/bin/bash
# Chunked training: rerun a (auto-resuming) train command until its log
# shows the target epoch's test line.  Mitigation for environments where
# long-lived trainer processes die (this round: a relay-client host leak
# OOM-kills trainers after ~12-15 epochs — RESULTS.md round 5); orbax
# auto-resume + per-epoch snapshots make each death a clean chunk boundary.
#
# Usage: train_chunked.sh <final_epoch> <logfile> <train command...>
#   e.g. train_chunked.sh 59 logs/train_x.log \
#          python -m feature_point_cnn_tpu.main train --epochs 60 ...
# NOTE: the trainer numbers epochs 0..N-1 for --epochs N (epoch 0 is the
# pre-train eval), so <final_epoch> must be N-1 — passing N makes the
# loop re-launch an already-finished run (harmless no-ops via orbax
# auto-resume, but it wastes chunks and masks real completion).
set -u
TARGET_EPOCH=$1
LOG=$2
shift 2
for attempt in $(seq 1 12); do
  if grep -q "epoch ${TARGET_EPOCH} test" "$LOG" 2>/dev/null; then
    echo "[chunked] target epoch ${TARGET_EPOCH} reached after ${attempt} chunk(s)"
    exit 0
  fi
  echo "[chunked] chunk ${attempt}" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  sleep 5
done
echo "[chunked] gave up after 12 chunks"
exit 1
