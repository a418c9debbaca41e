#!/bin/bash
# Round-5 post-reset chip queue, part 3: the uint8/grayscale serving-ABI
# measurement (VERDICT r4 item 4c; the ABI ships with bit-exactness tests
# but its link-bound win was never measured).  Runs after the ctl train
# releases the chip.  The hinge_hn and aug arms are RETRACTED this round
# (RESULTS.md round-5 A/B section): at the measured 85 s/epoch (and 3x
# that for hinge_hn) neither can complete a matched schedule in the
# remaining wall budget, and an unmatched run would not answer the
# question the A/B poses.
# Usage: DEADLINE_EPOCH=<unix s> CTL_PID=<pid> bash tools/run_session_r5g.sh
set -x
cd /root/repo
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (unix seconds)}
BIN=${BIN:-/tmp/build_csrc/superpoint_serve}

# wait (up to 25 min) for the ctl trainer to release the exclusive chip
if [ -n "${CTL_PID:-}" ]; then
  for _ in $(seq 1 300); do
    kill -0 "$CTL_PID" 2>/dev/null || break
    sleep 5
  done
fi

gate() {
  if [ -f tools/STOP_QUEUES ]; then
    echo "[queue] STOP_QUEUES present - exiting before stage $1"; exit 0
  fi
  if [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
    echo "[queue] deadline passed - exiting before stage $1"; exit 0
  fi
}

REL="weights/$(cat weights/RELEASED)"

gate export_u8
for b in 1 32; do
  batch_flag=""
  [ "$b" != 1 ] && batch_flag="--batch $b"
  timeout 600 python -m feature_point_cnn_tpu.main export \
      --weights-path "$REL" \
      --pjrt-out "_exports/joint_r5_packed_b${b}_u8gray" \
      --abi packed --top-n 256 $batch_flag --fold-bn \
      --input-dtype u8 --gray >> logs/export_u8_r5.log 2>&1
  sleep 5
done

gate native_u8_b32
timeout 700 "$BIN" --model _exports/joint_r5_packed_b32_u8gray \
    --frames 12 --pipeline 1,2 > logs/native_u8_b32_r5.log 2>&1
sleep 5
gate native_u8_b1
timeout 700 "$BIN" --model _exports/joint_r5_packed_b1_u8gray \
    --frames 40 --pipeline 1,2,4,8 > logs/native_u8_b1_r5.log 2>&1

echo SESSION_R5G_QUEUE_DONE
