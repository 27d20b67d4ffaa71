"""All prior gating modes must compile and keep the GN step finite."""

import itertools

import numpy as np
import pytest

from como_tpu.odom.backend.gn_step import SigmaStatic, gn_step
from como_tpu.odom.window import make_dims
from como_tpu.utils.demo import make_demo_state

DIMS = make_dims(num_kf=4, num_ow=2, M=16, img_size=(48, 64))


@pytest.fixture(scope="module")
def demo():
    return make_demo_state(DIMS, num_kf=3, num_ow=1, step=0.03)


LD_MODES = ["first_mean", "first_curr", "all_curr", "all_mean",
            "first_plus_rest_mean", "first_plus_rest_curr"]
PX_MODES = ["first", "all_curr", "all_mean", "first_plus_rest_mean",
            "first_plus_rest_curr"]


@pytest.mark.parametrize("ld", LD_MODES)
def test_log_depth_modes(demo, ld):
    state, pairs, K = demo
    sig = SigmaStatic(log_depth_mode=ld)
    st, stats = gn_step(state, *pairs, K, DIMS, sig, 1e-6)
    assert np.isfinite(float(stats.total_err))
    assert np.all(np.isfinite(np.array(st.kf_pose)))


@pytest.mark.parametrize("px", PX_MODES)
def test_pixel_modes(demo, px):
    state, pairs, K = demo
    sig = SigmaStatic(pixel_mode=px)
    st, stats = gn_step(state, *pairs, K, DIMS, sig, 1e-6)
    assert np.isfinite(float(stats.total_err))
    assert np.all(np.isfinite(np.array(st.P_lm)))
