"""Trajectory I/O + ATE evaluation.

Spec: reference como/utils/io.py (TUM-format trajectory writer) plus the
ATE RMSE evaluation the reference defers to external tooling (the
standard TUM scripts): Horn/Umeyama alignment with optional scale, then
RMSE of translational residuals.
"""

from __future__ import annotations

import numpy as np

from como_tpu.geometry.lie import pose_to_tq, tq_to_pose


def save_traj(filename: str, timestamps, poses: np.ndarray) -> None:
    """TUM format: 'ts tx ty tz qx qy qz qw' per line."""
    with open(filename, "w") as f:
        for ts, T in zip(timestamps, poses):
            tq = pose_to_tq(np.asarray(T))
            f.write("%.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f\n"
                    % (ts, *tq))


def load_traj(filename: str):
    data = np.loadtxt(filename)
    return data[:, 0], tq_to_pose(data[:, 1:8])


def umeyama_align(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Similarity transform aligning src (N,3) onto dst (N,3).
    Returns (s, R, t) with dst ~ s R src + t."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(S) @ D) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est_poses: np.ndarray, gt_poses: np.ndarray,
             with_scale: bool = True) -> float:
    """Absolute trajectory error RMSE after similarity alignment (monocular
    SLAM is evaluated scale-aligned, as in the reference paper)."""
    p_est = est_poses[:, :3, 3]
    p_gt = gt_poses[:, :3, 3]
    s, R, t = umeyama_align(p_est, p_gt, with_scale)
    aligned = (s * (R @ p_est.T)).T + t
    err = aligned - p_gt
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))
