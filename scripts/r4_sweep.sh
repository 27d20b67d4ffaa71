#!/bin/bash
# Round-4 experiment queue: runs sequentially (ONE JAX process at a time
# on the 1-core host), appends labeled results to $OUT.
OUT=${OUT:-/tmp/r4_sweep.log}
run() {
  label="$1"; shift
  echo "=== $label : $*" >> "$OUT"
  timeout 1200 python scripts/run_full_tpu.py "$@" >> "$OUT" 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" >> "$OUT"
}

# orbit (400 frames, step 0.012, seed 0) depth-1 cells + coverage trigger
run orbit_d1_base      --frames 400 --scene clutter --step 0.012 --lag 1
run orbit_d1_rot_ema   --frames 400 --scene clutter --step 0.012 --lag 1 --rot_weight 0.5 --stat_ema 0.5
run orbit_d1_rot_cov   --frames 400 --scene clutter --step 0.012 --lag 1 --rot_weight 0.5 --kf_pixels_frac 0.85
run orbit_d2_rot_cov   --frames 400 --scene clutter --step 0.012 --lag 2 --rot_weight 0.5 --kf_pixels_frac 0.85
run orbit_b2_rot       --frames 400 --scene clutter --step 0.012 --batch 2 --lag 6 --rot_weight 0.5

# bench-world seed-1 tail (110 frames, step 0.02, batch 2 depth 6)
run tail_s1_motion     --frames 110 --scene clutter --step 0.02 --seed 1 --batch 2 --lag 6 --motion
run tail_s1_rot        --frames 110 --scene clutter --step 0.02 --seed 1 --batch 2 --lag 6 --rot_weight 0.5
run tail_s1_ow2        --frames 110 --scene clutter --step 0.02 --seed 1 --batch 2 --lag 6 --one_way_freq 2
echo "ALL DONE" >> "$OUT"
