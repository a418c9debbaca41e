#!/bin/bash
# Round-4 native serving sweep: pipeline depth x batch (VERDICT r3 item 6).
# Uses bundles exported from the RELEASED weights (f32 packed coords,
# fold_bn export topology) under _exports/ — export them first with:
#   python -m feature_point_cnn_tpu.main export --weights-path \
#     weights/$(cat weights/RELEASED) --pjrt-out _exports/joint_r4_packed_bN \
#     --abi packed --top-n 256 [--batch N] --fold-bn
# `--pipeline 1,2,4,8` runs every depth in ONE process, so the multi-minute
# remote compile is paid once per bundle, not once per sweep point (the
# first version of this sweep timed out paying it 10x).  Sequential —
# exclusive chip claim.  Build first:
#   cmake -S csrc -B /tmp/build_csrc -G Ninja && ninja -C /tmp/build_csrc
set -x
BIN=${BIN:-/tmp/build_csrc/superpoint_serve}

# _exports/ is not versioned: re-export any missing bundle from the RELEASED
# weights so this script works on a fresh environment (advisor r4 finding)
for b in 1 32; do
  if [ ! -d "_exports/joint_r4_packed_b$b" ]; then
    batch_flag=""
    [ "$b" != 1 ] && batch_flag="--batch $b"
    timeout 1800 python -m feature_point_cnn_tpu.main export \
      --weights-path "weights/$(cat weights/RELEASED)" \
      --pjrt-out "_exports/joint_r4_packed_b$b" \
      --abi packed --top-n 256 $batch_flag --fold-bn || exit 1
    sleep 5
  fi
done

echo "=== packed b1, pipeline depths 1,2,4,8 ==="
timeout 2700 "$BIN" --model _exports/joint_r4_packed_b1 \
    --frames 40 --pipeline 1,2,4,8
sleep 20
echo "=== packed b32 (batched execute), pipeline depths 1,2 ==="
timeout 2700 "$BIN" --model _exports/joint_r4_packed_b32 \
    --frames 12 --pipeline 1,2
echo NATIVE_SWEEP_DONE
