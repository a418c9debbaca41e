#!/bin/bash
# Round-4 native serving sweep: pipeline depth x batch (VERDICT r3 item 6).
# Exports fresh bundles from the RELEASED weights (f32 packed coords,
# fold_bn for the export topology), then measures csrc/superpoint_serve FPS
# at pipeline depths 1/2/4/8 (batch 1) and batched-execute b8/b32 (the
# round-trip amortization the Python bench gets from b64).  Sequential —
# exclusive chip.  Build first: cmake -S csrc -B /tmp/build_csrc -G Ninja &&
# ninja -C /tmp/build_csrc
set -x
BIN=${BIN:-/tmp/build_csrc/superpoint_serve}
W=weights/$(cat weights/RELEASED)

timeout 1200 python -m feature_point_cnn_tpu.main export \
    --weights-path "$W" --pjrt-out _exports/joint_r4_packed_b1 \
    --abi packed --top-n 256 --fold-bn
sleep 20
timeout 1200 python -m feature_point_cnn_tpu.main export \
    --weights-path "$W" --pjrt-out _exports/joint_r4_packed_b8 \
    --abi packed --top-n 256 --batch 8 --fold-bn
sleep 20
timeout 1200 python -m feature_point_cnn_tpu.main export \
    --weights-path "$W" --pjrt-out _exports/joint_r4_packed_b32 \
    --abi packed --top-n 256 --batch 32 --fold-bn
sleep 20

for depth in 1 2 4 8; do
  echo "=== packed b1 pipeline=$depth ==="
  timeout 900 "$BIN" --model _exports/joint_r4_packed_b1 \
      --frames 60 --pipeline "$depth"
  sleep 20
done
for b in 8 32; do
  for depth in 1 2 4; do
    echo "=== packed b$b pipeline=$depth ==="
    timeout 900 "$BIN" --model "_exports/joint_r4_packed_b$b" \
        --frames 30 --pipeline "$depth"
    sleep 20
  done
done
echo NATIVE_SWEEP_DONE
