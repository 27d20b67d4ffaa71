"""Convert ScanNet per-frame pose files (pose/N.txt, 4x4 camera-to-world)
to TUM trajectory format (reference scripts/convert_scannet_test_gt.py)."""

import argparse
import glob
import os
import re

import numpy as np

from como_tpu.utils.io import save_traj


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_dir", required=True)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    files = sorted(glob.glob(os.path.join(args.dataset_dir, "pose", "*.txt")),
                   key=lambda x: int(re.findall(r"\d+", os.path.basename(x))[0]))
    poses, ts = [], []
    for i, f in enumerate(files):
        T = np.loadtxt(f)
        if not np.all(np.isfinite(T)):
            continue
        poses.append(T)
        ts.append(i / 30.0)
    out = args.out or os.path.join(args.dataset_dir, "gt_traj_tum.txt")
    save_traj(out, np.array(ts), np.stack(poses))
    print(f"{len(poses)} poses -> {out}")


if __name__ == "__main__":
    main()
