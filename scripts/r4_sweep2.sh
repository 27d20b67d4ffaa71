#!/bin/bash
# Round-4 queue 2: candidate-default validation (rot_weight 0.5 +
# kf_pixels_frac 0.85), clutter_photo full-size bound, selector
# calibration.  Sequential — one JAX process at a time.
OUT=${OUT:-/tmp/r4_sweep2.log}
run() {
  label="$1"; shift
  echo "=== $label : $*" >> "$OUT"
  timeout 1200 python scripts/run_full_tpu.py "$@" >> "$OUT" 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"
}

# selector calibration: the r2 checkpoint's known full-size behavior is
# clutter-win / plane-lose-2.4x — the small-size e2e score must see it
echo "=== calib_r2_ckpt" >> "$OUT"
timeout 1200 python scripts/select_checkpoint.py models/depthcov.msgpack >> "$OUT" 2>&1
echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"

# plane long-run no-regression at candidate defaults
run plane400_rot_cov   --frames 400 --scene plane --step 0.012 --lag 2 --rot_weight 0.5 --kf_pixels_frac 0.85
# orbit at the bench operating point with the full candidate defaults
run orbit_b2_rot_cov   --frames 400 --scene clutter --step 0.012 --batch 2 --lag 6 --rot_weight 0.5 --kf_pixels_frac 0.85

# bench world (110f step 0.02 batch2 lag6) at candidate defaults, all seeds
run bench_s0_rot_cov   --frames 110 --scene clutter --step 0.02 --seed 0 --batch 2 --lag 6 --rot_weight 0.5 --kf_pixels_frac 0.85
run bench_s1_rot_cov   --frames 110 --scene clutter --step 0.02 --seed 1 --batch 2 --lag 6 --rot_weight 0.5 --kf_pixels_frac 0.85
run bench_s2_rot_cov   --frames 110 --scene clutter --step 0.02 --seed 2 --batch 2 --lag 6 --rot_weight 0.5 --kf_pixels_frac 0.85

# clutter_photo full-size multi-seed bound (VERDICT #6), current defaults
run photo_s0           --frames 120 --scene clutter_photo --step 0.012 --seed 0
run photo_s1           --frames 120 --scene clutter_photo --step 0.012 --seed 1
run photo_s2           --frames 120 --scene clutter_photo --step 0.012 --seed 2
echo "ALL DONE" >> "$OUT"
