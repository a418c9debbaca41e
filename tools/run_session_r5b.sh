#!/bin/bash
# Round-5 follow-up chip queue (launched after run_session_r5.sh), highest
# value first so a schedule slip costs the least-important stage:
#   1. fresh bench (pipelined headline + round-5 kernels/gather)
#   2. serving stage profile (isolates the descriptor-sampling stage)
#   3. pose-graph tracking eval on the RELEASED weights (VERDICT item 7)
#   4. uint8/grayscale ABI exports + native sweep A/B (VERDICT item 4c)
# Same discipline as r5: every stage under timeout, gated on STOP_QUEUES.
set -x
cd /root/repo
BIN=${BIN:-/tmp/build_csrc/superpoint_serve}

gate() {
  if [ -f tools/STOP_QUEUES ]; then
    echo "[queue] STOP_QUEUES present - exiting before stage $1"
    exit 0
  fi
}

REL="weights/$(cat weights/RELEASED)"

gate bench_r5b
BENCH_BUDGET_S=900 timeout 1500 python bench.py > logs/bench_r5b.log 2>&1
sleep 10

gate profile_final
timeout 2400 python tools/profile_serving.py > logs/profile_serving_r5b.log 2>&1
sleep 10

gate tracking_pg
timeout 2400 python -m feature_point_cnn_tpu.eval.tracking \
    --weights-path "$REL" --source _data/real_corpus_r3/test2014 \
    --frames 200 --loops 3 --max-shift 40 \
    --posegraph > logs/tracking_r5_pg.log 2>&1
sleep 10

gate export_u8
for b in 1 32; do
  batch_flag=""
  [ "$b" != 1 ] && batch_flag="--batch $b"
  timeout 1800 python -m feature_point_cnn_tpu.main export \
      --weights-path "$REL" \
      --pjrt-out "_exports/joint_r5_packed_b${b}_u8gray" \
      --abi packed --top-n 256 $batch_flag --fold-bn \
      --input-dtype u8 --gray >> logs/export_u8_r5.log 2>&1
  sleep 10
done

gate native_u8
echo "=== u8+gray b1, pipeline depths 1,2,4,8 ==="
timeout 2700 "$BIN" --model _exports/joint_r5_packed_b1_u8gray \
    --frames 40 --pipeline 1,2,4,8 > logs/native_u8_b1_r5.log 2>&1
sleep 10
echo "=== u8+gray b32, pipeline depths 1,2 ==="
timeout 2700 "$BIN" --model _exports/joint_r5_packed_b32_u8gray \
    --frames 12 --pipeline 1,2 > logs/native_u8_b32_r5.log 2>&1
sleep 10

echo SESSION_R5B_QUEUE_DONE
