import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from como_tpu.geometry import lie


def random_xi(key, scale=1.0, n=8):
    return scale * jax.random.normal(key, (n, 6))


def test_se3_exp_matches_scipy():
    rng = np.random.default_rng(0)
    for _ in range(20):
        omega = rng.normal(size=3)
        v = rng.normal(size=3)
        xi = jnp.array(np.concatenate([omega, v]), dtype=jnp.float64) \
            if jax.config.jax_enable_x64 else jnp.array(np.concatenate([omega, v]), dtype=jnp.float32)
        T = np.array(lie.se3_exp(xi))
        R_expect = Rotation.from_rotvec(omega).as_matrix()
        np.testing.assert_allclose(T[:3, :3], R_expect, atol=1e-5)
        assert abs(T[3, 3] - 1.0) < 1e-6


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(1)
    xi = random_xi(key, scale=0.8)
    T = lie.se3_exp(xi)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.array(xi), np.array(xi2), atol=1e-4)


def test_exp_log_small_angle():
    xi = jnp.array([[1e-9, -1e-9, 1e-10, 0.3, -0.2, 0.1]], dtype=jnp.float32)
    T = lie.se3_exp(xi)
    assert np.all(np.isfinite(np.array(T)))
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.array(xi[:, 3:]), np.array(xi2[:, 3:]), atol=1e-5)


def test_invert():
    key = jax.random.PRNGKey(2)
    T = lie.se3_exp(random_xi(key))
    I = np.array(T @ lie.invert_se3(T))
    np.testing.assert_allclose(I, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_adjoint_identity():
    """Adj(T) xi == log(T exp(xi) T^-1) for small xi."""
    key = jax.random.PRNGKey(3)
    T = lie.se3_exp(random_xi(key, n=4))
    xi = 1e-3 * jax.random.normal(jax.random.PRNGKey(4), (4, 6))
    lhs = jnp.einsum("bij,bj->bi", lie.adjoint(T), xi)
    rhs = lie.se3_log(T @ lie.se3_exp(xi) @ lie.invert_se3(T))
    np.testing.assert_allclose(np.array(lhs), np.array(rhs), atol=1e-5)


def test_skew():
    p = jnp.array([1.0, 2.0, 3.0])
    x = jnp.array([0.5, -0.5, 2.0])
    np.testing.assert_allclose(
        np.array(lie.skew(p) @ x), np.cross(np.array(p), np.array(x)), atol=1e-6
    )


def test_normalize_rotation():
    key = jax.random.PRNGKey(5)
    T = lie.se3_exp(random_xi(key, n=2))
    T_noisy = T + 1e-3 * jax.random.normal(jax.random.PRNGKey(6), T.shape)
    Tn = lie.normalize_rotation(T_noisy)
    R = np.array(Tn[..., :3, :3])
    np.testing.assert_allclose(R @ R.swapaxes(-1, -2), np.tile(np.eye(3), (2, 1, 1)), atol=1e-5)
    assert np.all(np.linalg.det(R) > 0)


def test_pose_tq_roundtrip():
    rng = np.random.default_rng(7)
    T = np.array(lie.se3_exp(jnp.array(rng.normal(size=(5, 6)), dtype=jnp.float32)))
    tq = lie.pose_to_tq(T)
    T2 = lie.tq_to_pose(tq)
    np.testing.assert_allclose(T, T2, atol=1e-5)
