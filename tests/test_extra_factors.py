"""Optional reference-parity factors (range + dense depth prior):
Jacobians verified against autodiff through the retraction."""

import jax
import jax.numpy as jnp
import numpy as np

from como_tpu.geometry import lie
from como_tpu.odom.backend import extra_factors as xf


def _rand_pose(rng):
    xi = jnp.array(rng.normal(size=6) * 0.3, jnp.float32)
    T = lie.se3_exp(xi)
    return T.at[:3, 3].add(jnp.array(rng.normal(size=3), jnp.float32))


def test_pose_range_factor_jacobians():
    rng = np.random.default_rng(0)
    T1 = _rand_pose(rng)[None]
    T2 = _rand_pose(rng)[None]
    sigma = 0.05
    meas = jnp.array([1.3])

    r0, J1, J2, err = xf.pose_range_factor(meas, T1, T2, sigma)
    assert np.isclose(float(err), float(np.sum(np.array(r0) ** 2)))

    def r_of(xi1, xi2):
        P1 = T1 @ lie.se3_exp(xi1[None])
        P2 = T2 @ lie.se3_exp(xi2[None])
        return xf.pose_range_factor(meas, P1, P2, sigma)[0][0]

    g1 = jax.jacfwd(r_of, argnums=0)(jnp.zeros(6), jnp.zeros(6))
    g2 = jax.jacfwd(r_of, argnums=1)(jnp.zeros(6), jnp.zeros(6))
    np.testing.assert_allclose(np.array(J1[0]), np.array(g1), atol=1e-4)
    np.testing.assert_allclose(np.array(J2[0]), np.array(g2), atol=1e-4)


def test_dense_depth_prior_matches_autodiff():
    rng = np.random.default_rng(1)
    N, M = 40, 8
    W_nm = jnp.array(rng.normal(size=(N, M)) * 0.2, jnp.float32)
    q_n = jnp.array(rng.normal(size=(N, 6)) * 0.1, jnp.float32)
    zm = jnp.array(rng.uniform(1.0, 3.0, M), jnp.float32)
    logzm = jnp.log(zm)
    target = jnp.float32(0.7)
    sigma = 0.2

    out = xf.dense_depth_prior(W_nm @ logzm, target, W_nm, q_n, 1.0 / zm,
                               jnp.array([0.0, 0.0, 1.0]), sigma)

    # gradient wrt anchor depth z: g must equal -d(0.5*info*r^2)/dz
    def cost(z):
        r = W_nm @ jnp.log(z) - target
        return 0.5 * jnp.sum(r ** 2) / sigma ** 2

    g_auto = -jax.grad(cost)(zm)
    np.testing.assert_allclose(np.array(out["g_zm"]), np.array(g_auto),
                               rtol=1e-4, atol=1e-5)
    # Gauss-Newton Hessian wrt z: A^T A * info
    A = np.array(W_nm) / np.array(zm)[None, :]
    np.testing.assert_allclose(np.array(out["H_zm"]),
                               (A.T @ A) / sigma ** 2, rtol=1e-4, atol=1e-5)
    assert np.isfinite(float(out["err"]))
