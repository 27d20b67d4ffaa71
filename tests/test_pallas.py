"""Pallas cross-covariance kernel vs the XLA reference implementation
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from como_tpu.gp import kernels
from como_tpu.gp import kernels_pallas as kp


@pytest.mark.skipif(not kp._HAS_PALLAS, reason="pallas unavailable")
def test_pallas_matches_xla_interpret():
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    N, M = 700, 20
    x_n = jnp.array(rng.uniform(-1, 1, (N, 2)), jnp.float32)
    e_n = jnp.array(np.abs(rng.normal(size=(N, 3))) * 0.3 + 0.1, jnp.float32)
    e_n = e_n.at[:, 2].set(0.05)
    x_m = jnp.array(rng.uniform(-1, 1, (M, 2)), jnp.float32)
    e_m = jnp.array(np.abs(rng.normal(size=(M, 3))) * 0.3 + 0.1, jnp.float32)
    e_m = e_m.at[:, 2].set(0.0)

    want = np.array(kernels.cross_covariance(x_n, e_n, x_m, e_m, 1.3))

    import jax.experimental.pallas.tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.array(kp.cross_covariance_pallas(x_n, e_n, x_m, e_m, 1.3))

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
