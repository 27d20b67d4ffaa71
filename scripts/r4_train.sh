#!/bin/bash
# Round-4 queue 4: re-calibrate the 2-seed full-size selector on the r2
# checkpoint, then retrain with e2e-in-the-loop selection.
OUT=${OUT:-/tmp/r4_train.log}
echo "=== calib_r2_fullsize_2seed" >> "$OUT"
timeout 2400 python scripts/select_checkpoint.py models/depthcov.msgpack >> "$OUT" 2>&1
echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"

echo "=== train_e2e" >> "$OUT"
timeout 14400 python scripts/train_depthcov.py --data synthetic --steps 3000 \
  --select e2e --select_every 500 --out /tmp/depthcov_r4.msgpack >> "$OUT" 2>&1
echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"
echo "ALL DONE" >> "$OUT"
