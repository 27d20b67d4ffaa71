"""Multi-chip BA: the sharded GN step on an 8-device CPU mesh must
produce the same update as the single-chip step (the MAD sigma is
computed globally via psum'd histograms, so results are equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from como_tpu.config import ComoConfig
from como_tpu.data.synthetic import SyntheticDataset
from como_tpu.odom.backend.gn_step import gn_step
from como_tpu.parallel import sharded
from como_tpu.runtime.seq import ComoSeq

IMG = (48, 64)


def small_config():
    cfg = ComoConfig()
    cfg.img_size = list(IMG)
    cfg.mapping.graph.num_keyframes = 4
    cfg.mapping.graph.num_one_way_frames = 5  # P = 6 + 10 = 16 = 8 * 2
    cfg.mapping.sampling.max_num_coords = 16
    cfg.mapping.sampling.border = 2
    return cfg.validate()


@pytest.fixture(scope="module")
def warm_engine():
    ds = SyntheticDataset(n_frames=18, img_size=IMG, seed=0, step=0.012)
    eng = ComoSeq(small_config(), ds.intrinsics, IMG)
    eng.setup()
    eng.run(ds)
    assert eng.mapping.is_init
    return eng


def test_sharded_matches_single(warm_engine):
    m = warm_engine.mapping
    assert len(jax.devices()) == 8
    mesh = sharded.make_mesh()
    step = sharded.make_sharded_gn_step(mesh, m.dims, m.sigmas,
                                        m.cfg.gn_damping)
    pr, pt, pv = m._pairs

    st1, stats1 = gn_step(m.state, pr, pt, pv, m.K, m.dims, m.sigmas,
                          m.cfg.gn_damping)
    st2, stats2 = step(m.state, pr, pt, pv, m.K)

    np.testing.assert_allclose(np.array(stats1.total_err),
                               np.array(stats2.total_err), rtol=1e-3)
    np.testing.assert_allclose(np.array(st1.kf_pose), np.array(st2.kf_pose),
                               atol=1e-4)
    np.testing.assert_allclose(np.array(st1.P_lm), np.array(st2.P_lm),
                               atol=1e-3)


def test_sharded_step_runs_repeatedly(warm_engine):
    m = warm_engine.mapping
    mesh = sharded.make_mesh()
    step = sharded.make_sharded_gn_step(mesh, m.dims, m.sigmas,
                                        m.cfg.gn_damping)
    pr, pt, pv = m._pairs
    st = m.state
    errs = []
    for _ in range(3):
        st, stats = step(st, pr, pt, pv, m.K)
        errs.append(float(stats.total_err))
    assert all(np.isfinite(errs))
