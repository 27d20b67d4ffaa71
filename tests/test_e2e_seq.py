"""End-to-end sequential SLAM on the synthetic plane scene: bootstrap via
two-frame SfM, track + map a short sequence, and require a small ATE
after similarity alignment.  This is the reference's only validation
path (run a sequence, measure ATE) made automatic."""

import jax.numpy as jnp
import numpy as np
import pytest

from como_tpu.config import ComoConfig
from como_tpu.data.synthetic import SyntheticDataset
from como_tpu.runtime.seq import ComoSeq
from como_tpu.utils.io import ate_rmse

IMG = (48, 64)


def small_config():
    cfg = ComoConfig()
    cfg.img_size = list(IMG)
    cfg.mapping.graph.num_keyframes = 4
    cfg.mapping.graph.num_one_way_frames = 4
    cfg.mapping.sampling.max_num_coords = 16
    cfg.mapping.sampling.border = 2
    cfg.mapping.init.max_iter = 30
    cfg.tracking.term_criteria.max_iter = 30
    return cfg.validate()


@pytest.fixture(scope="module")
def run_result():
    ds = SyntheticDataset(n_frames=25, img_size=IMG, seed=0, step=0.012)
    cfg = small_config()
    eng = ComoSeq(cfg, ds.intrinsics, IMG)
    eng.setup()
    ts, est = eng.run(ds)
    gt = np.array(ds.poses[: len(ds)])
    return ds, eng, ts, est, gt


def test_initializes(run_result):
    ds, eng, ts, est, gt = run_result
    assert eng.mapping.is_init
    assert eng.mapping.num_kf >= 2
    assert len(ts) > 5


def test_poses_finite(run_result):
    _, _, _, est, _ = run_result
    assert np.all(np.isfinite(est))


def test_ate_small(run_result):
    ds, eng, ts, est, gt = run_result
    # match estimated timestamps to gt indices
    idx = (np.asarray(ts) * 30.0).round().astype(int)
    ate = ate_rmse(est, gt[idx], with_scale=True)
    # scene is ~2m away; sub-2cm ATE on a 25-frame easy synthetic sequence
    assert ate < 0.02, f"ATE {ate}"


def test_landmarks_sane(run_result):
    """Monocular scale is gauge-fixed by the mean-log-depth prior (not
    metric), so check *structure*: landmarks must lie near a single plane
    (the synthetic world is one plane)."""
    _, eng, _, _, _ = run_result
    st = eng.mapping.state
    P = np.array(st.P_lm)[np.array(st.lm_valid)]
    assert np.all(np.isfinite(P))
    assert 0.2 < np.median(P[:, 2]) < 5.0
    # fit plane z = a x + b y + c; residuals must be small vs depth scale
    A = np.concatenate([P[:, :2], np.ones((len(P), 1))], axis=1)
    coef, *_ = np.linalg.lstsq(A, P[:, 2], rcond=None)
    resid = P[:, 2] - A @ coef
    assert np.sqrt((resid ** 2).mean()) < 0.05 * np.median(P[:, 2])
