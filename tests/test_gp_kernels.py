"""GP kernel correctness: cross-checked against an independent direct
implementation of the Bhattacharyya probability-product + Matern spec
(torch/numpy, written from the math, mirroring the reference's twin
implementations in kernels.py / cov_cpu.cpp)."""

import math

import jax.numpy as jnp
import numpy as np

from como_tpu.gp import kernels


def _direct_kernel(x1, E1, x2, E2, scale):
    """Straightforward per-pair numpy evaluation from the formulas."""
    N, M = x1.shape[0], x2.shape[0]
    K = np.zeros((N, M))
    for i in range(N):
        for j in range(M):
            Es = E1[i] + E2[j]
            det = np.linalg.det(Es)
            d = x1[i] - x2[j]
            Q = 0.5 * (d @ np.linalg.inv(Es) @ d)
            C = 2.0 * (np.linalg.det(E1[i]) * np.linalg.det(E2[j])) ** 0.25 / math.sqrt(det)
            t = math.sqrt(3.0) * math.sqrt(Q + 1e-8)
            K[i, j] = scale * C * (1 + t) * math.exp(-t)
    return K


def random_sites(rng, n, spread=0.5):
    x = rng.uniform(-1, 1, size=(n, 2))
    A = rng.normal(size=(n, 2, 2)) * spread
    E = A @ A.swapaxes(-1, -2) + 0.05 * np.eye(2)
    return x, E


def test_cross_covariance_matches_direct():
    rng = np.random.default_rng(0)
    x1, E1 = random_sites(rng, 12)
    x2, E2 = random_sites(rng, 9)
    scale = 1.7
    ours = np.array(
        kernels.cross_covariance(
            jnp.array(x1, jnp.float32), kernels.pack_cov(jnp.array(E1, jnp.float32)),
            jnp.array(x2, jnp.float32), kernels.pack_cov(jnp.array(E2, jnp.float32)),
            scale,
        )
    )
    ref = _direct_kernel(x1, E1, x2, E2, scale)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_self_covariance_spd_and_unit_diag():
    rng = np.random.default_rng(1)
    x, E = random_sites(rng, 32)
    e = kernels.pack_cov(jnp.array(E, jnp.float32))
    xn = jnp.array(x, jnp.float32)
    K = np.array(kernels.cross_covariance(xn, e, xn, e, 1.0))
    # symmetric
    np.testing.assert_allclose(K, K.T, atol=1e-5)
    # K(x,x) ~ scale (prob-product with p=1/2 is 1 on the diagonal)
    np.testing.assert_allclose(np.diag(K), np.ones(32), atol=1e-3)
    # PSD (with small jitter)
    w = np.linalg.eigvalsh(K + 1e-4 * np.eye(32))
    assert w.min() > 0


def test_diag_covariance_matches_cross():
    rng = np.random.default_rng(2)
    x, E = random_sites(rng, 16)
    e = kernels.pack_cov(jnp.array(E, jnp.float32))
    xn = jnp.array(x, jnp.float32)
    diag = np.array(kernels.diag_covariance(e, 2.5))
    K = np.array(kernels.cross_covariance(xn, e, xn, e, 2.5))
    np.testing.assert_allclose(diag, np.diag(K), rtol=1e-3, atol=1e-4)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(3)
    _, E = random_sites(rng, 5)
    E = jnp.array(E, jnp.float32)
    np.testing.assert_allclose(np.array(kernels.unpack_cov(kernels.pack_cov(E))), np.array(E))


def test_interpolate_cov_params():
    # constant image -> any sample returns the constant
    img = jnp.stack([jnp.full((8, 10), 2.0), jnp.full((8, 10), 3.0), jnp.full((8, 10), 0.5)])
    coords_norm = jnp.array([[0.0, 0.0], [-0.9, 0.9], [2.0, -2.0]])  # last out of range -> border
    e = np.array(kernels.interpolate_cov_params(img, coords_norm))
    np.testing.assert_allclose(e, np.tile([2.0, 3.0, 0.5], (3, 1)), atol=1e-5)
