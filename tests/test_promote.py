"""Keyframe insertion-target promotion + dispatch-lag anticipation
(round-5 keyframing robustness; reference decides on and inserts the
CURRENT frame, como/odom/Tracking.py:114-167 — these knobs restore that
semantics under pipelined decisions).

kf_promote_latest: when a keyframe decision fires for a lag-old frame,
insert the NEWEST dispatched frame instead.
kf_anticipate: extrapolate the keyframe motion criterion `lag` frames
ahead so the trigger fires when the pipeline head crosses the threshold.
"""

import numpy as np

from como_tpu.config import ComoConfig
from como_tpu.data.synthetic import SyntheticDataset
from como_tpu.runtime.seq import ComoSeq
from como_tpu.utils.io import ate_rmse

IMG = (48, 64)
LAG = 4
DT = 1.0 / 30.0


def make_cfg(**keyframing):
    cfg = ComoConfig()
    cfg.img_size = list(IMG)
    cfg.dispatch_depth = LAG
    cfg.mapping.graph.num_keyframes = 6
    cfg.mapping.graph.num_one_way_frames = 6
    cfg.mapping.sampling.max_num_coords = 16
    cfg.mapping.sampling.border = 2
    cfg.mapping.init.max_iter = 30
    cfg.tracking.term_criteria.max_iter = 30
    # reference-style baseline (defaults ship promote+ema+auto-anticipate
    # since round 5): each test enables exactly the knob it isolates
    cfg.tracking.keyframing.kf_promote_latest = False
    cfg.tracking.keyframing.stat_ema = 0.0
    cfg.tracking.keyframing.kf_anticipate = 0
    for k, v in keyframing.items():
        setattr(cfg.tracking.keyframing, k, v)
    return cfg.validate()


def run(cfg, n_frames=30):
    ds = SyntheticDataset(n_frames=n_frames, img_size=IMG, seed=0, step=0.02,
                          scene="clutter")
    eng = ComoSeq(cfg, ds.intrinsics, IMG)
    eng.setup()
    ts, est = eng.run(ds)
    idx = (np.asarray(ts) * 30.0).round().astype(int)
    gt = np.array(ds.poses)[idx]
    return eng, np.asarray(est), gt


def kf_timestamps(eng):
    m = eng.mapping
    return [float(t) for t in np.asarray(m.kf_ts[: m.num_kf])]


def test_promote_latest_inserts_head_frame():
    """Decisions resolve LAG frames after dispatch; with promotion the
    inserted keyframe is the pipeline head.  Resolution runs at the START
    of a step, before the step's own frame is dispatched, so the head is
    the newest DISPATCHED frame — LAG-1 frames past the trigger frame
    (promoting an undispatched frame would cost a fresh blocking round
    trip; the head's stats ride async copies already in flight)."""
    eng_base, est_b, gt_b = run(make_cfg())
    eng_prom, est_p, gt_p = run(make_cfg(kf_promote_latest=True))
    kf_b, kf_p = kf_timestamps(eng_base), kf_timestamps(eng_prom)
    assert len(kf_b) >= 3 and len(kf_p) >= 3, "world must trigger keyframes"
    # [0], [1] are the two bootstrap keyframes — identical by construction
    assert kf_b[:2] == kf_p[:2]
    lag_frames = round((kf_p[2] - kf_b[2]) / DT)
    assert lag_frames == LAG - 1, (kf_b, kf_p)
    # promotion must not break the run
    assert np.all(np.isfinite(est_p))
    assert ate_rmse(est_p, gt_p, with_scale=True) < 0.5


def test_promote_head_frame_not_reinserted():
    """The promoted frame's own pending entry must not insert again when
    it later resolves: keyframe count equals the baseline's trigger count
    (one insertion per fired decision), and consecutive KF timestamps are
    strictly increasing."""
    eng, _, _ = run(make_cfg(kf_promote_latest=True))
    kts = kf_timestamps(eng)
    assert all(b > a for a, b in zip(kts, kts[1:])), kts


def test_anticipate_fires_no_later():
    """Extrapolating the motion criterion LAG frames ahead can only move
    the first keyframe trigger earlier (rate clamped >= 0)."""
    eng_base, _, _ = run(make_cfg())
    eng_ant, est_a, gt_a = run(make_cfg(kf_anticipate=LAG))
    kf_b, kf_a = kf_timestamps(eng_base), kf_timestamps(eng_ant)
    assert len(kf_a) >= 3
    assert kf_a[2] <= kf_b[2], (kf_a, kf_b)
    assert np.all(np.isfinite(est_a))
    assert ate_rmse(est_a, gt_a, with_scale=True) < 0.5
