#!/bin/bash
# Round-4 queue 3: rot-only bench cells (default decision), full-size
# selector calibration, then the e2e-selected retrain.
OUT=${OUT:-/tmp/r4_sweep3.log}
run() {
  label="$1"; shift
  echo "=== $label : $*" >> "$OUT"
  timeout 1200 python scripts/run_full_tpu.py "$@" >> "$OUT" 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"
}

run bench_s0_rot   --frames 110 --scene clutter --step 0.02 --seed 0 --batch 2 --lag 6 --rot_weight 0.5
run bench_s2_rot   --frames 110 --scene clutter --step 0.02 --seed 2 --batch 2 --lag 6 --rot_weight 0.5

# full-size selector calibration: the r2 checkpoint must now show the
# known plane failure (ratio > 1) that 96x128 scoring could not see
echo "=== calib_r2_fullsize" >> "$OUT"
timeout 2400 python scripts/select_checkpoint.py models/depthcov.msgpack >> "$OUT" 2>&1
echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"

# retrain with e2e-in-the-loop selection at product resolution
echo "=== train_e2e" >> "$OUT"
timeout 14400 python scripts/train_depthcov.py --data synthetic --steps 3000 \
  --select e2e --select_every 500 --out /tmp/depthcov_r4.msgpack >> "$OUT" 2>&1
echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"
echo "ALL DONE" >> "$OUT"
