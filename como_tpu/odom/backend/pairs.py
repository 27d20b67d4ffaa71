"""Covisibility-graph pair construction (host-side, numpy).

Spec: reference como/odom/backend/graph_pair_construction.py.  Default
configuration (radius/degrees thresholds = 0) is purely temporal:
forward + backward consecutive keyframe chains, and each one-way frame
attached to the keyframes bracketing it in time.  The optional
radius/rotation edges are also implemented (numpy on 9 poses — trivial).

TPU design note: pair lists only change on frame insertion, never during
GN iterations, so they are computed once per insertion on the host and
shipped to the device padded to the static maximum
(P = 2*(K-1) + 2*O), with a validity mask.
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np


class PairBatch(NamedTuple):
    ref_kf: np.ndarray       # (P,) int32: slot of the reference keyframe
    target_slot: np.ndarray  # (P,) int32: global frame slot of the target
                             #     (kf slot k -> k;  ow slot j -> K + j)
    valid: np.ndarray        # (P,) bool


def temporal_ow_attachments(kf_ts: List[float], ow_ts: List[float]):
    """Attach each one-way frame to the keyframes bracketing its timestamp
    (both sides when between two KFs; only the last KF when newer).
    Matches reference get_one_way_temporal_neighbors semantics."""
    pairs = []
    nk = len(kf_ts)
    for r, t in enumerate(ow_ts):
        # last keyframe with ts <= t ("behind")
        behind = 0
        while behind + 1 < nk and kf_ts[behind + 1] < t:
            behind += 1
        if behind + 1 < nk and kf_ts[behind + 1] >= t:
            pairs.append((behind, r))
            pairs.append((behind + 1, r))
        else:
            pairs.append((nk - 1, r))
    return pairs


def radius_kf_edges(poses: np.ndarray, median_depths: np.ndarray,
                    radius_thresh: float, degrees_thresh: float):
    """Non-consecutive KF pairs within a scaled camera distance and
    rotation cone (reference get_kf_edges)."""
    n = poses.shape[0]
    t = poses[:, :3, 3]
    dists = np.linalg.norm(t[:, None] - t[None, :], axis=-1)
    scaled = dists / median_depths[:, None]
    R = poses[:, :3, :3]
    R12 = np.einsum("iab,jac->ijbc", R, R)
    cos_theta = 0.5 * (np.trace(R12, axis1=-2, axis2=-1) - 1.0)
    cos_thresh = np.cos(np.deg2rad(degrees_thresh))
    valid = (scaled < radius_thresh) & (cos_theta > cos_thresh)
    out = []
    for i in range(n):
        for j in range(n):
            if valid[i, j] and abs(i - j) > 1:
                out.append((i, j))
    return out


def build_pairs(num_kf: int, kf_ts: List[float], ow_ts: List[float],
                K_slots: int, P_max: int,
                poses: np.ndarray | None = None,
                median_depths: np.ndarray | None = None,
                radius_thresh: float = 0.0,
                degrees_thresh: float = 0.0) -> PairBatch:
    """All photometric pairs, padded to the static maximum."""
    ref, tgt = [], []
    # forward + backward consecutive keyframe chains
    for i in range(num_kf - 1):
        ref.append(i); tgt.append(i + 1)
        ref.append(i + 1); tgt.append(i)
    if radius_thresh > 0.0 and degrees_thresh > 0.0 and poses is not None:
        for i, j in radius_kf_edges(poses[:num_kf], median_depths[:num_kf],
                                    radius_thresh, degrees_thresh):
            ref.append(i); tgt.append(j)
    # one-way frames: reference keyframe -> one-way target
    for k, r in temporal_ow_attachments(kf_ts, ow_ts):
        ref.append(k); tgt.append(K_slots + r)

    n = len(ref)
    assert n <= P_max, f"pair count {n} exceeds static capacity {P_max}"
    ref_arr = np.zeros(P_max, np.int32)
    tgt_arr = np.zeros(P_max, np.int32)
    val_arr = np.zeros(P_max, bool)
    ref_arr[:n] = ref
    tgt_arr[:n] = tgt
    val_arr[:n] = True
    return PairBatch(ref_kf=ref_arr, target_slot=tgt_arr, valid=val_arr)
