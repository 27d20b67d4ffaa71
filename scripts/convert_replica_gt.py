"""Convert Replica ground-truth poses (traj.txt: 16 floats per row) to TUM
trajectory format for ATE evaluation (reference scripts/convert_replica_gt.py
— same role, written against our io module)."""

import argparse
import os

import numpy as np

from como_tpu.utils.io import save_traj


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_dir", required=True)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    traj = np.loadtxt(os.path.join(args.dataset_dir, "traj.txt"))
    poses = traj.reshape(-1, 4, 4)
    ts = np.arange(len(poses)) / 30.0
    out = args.out or os.path.join(args.dataset_dir, "gt_traj_tum.txt")
    save_traj(out, ts, poses)
    print(f"{len(poses)} poses -> {out}")


if __name__ == "__main__":
    main()
