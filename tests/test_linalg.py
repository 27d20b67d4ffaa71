import jax
import jax.numpy as jnp
import numpy as np
import torch

from como_tpu.ops import linalg


def test_masked_median_matches_torch():
    rng = np.random.default_rng(0)
    for n_valid in [1, 2, 7, 100, 101]:
        x = rng.normal(size=128).astype(np.float32)
        mask = np.zeros(128, dtype=bool)
        mask[rng.choice(128, n_valid, replace=False)] = True
        ours = float(linalg.masked_median(jnp.array(x), jnp.array(mask)))
        ref = float(torch.median(torch.from_numpy(x[mask])))
        assert abs(ours - ref) < 1e-6


def test_solve_chol():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(10, 10)).astype(np.float32)
    H = A @ A.T + 10 * np.eye(10, dtype=np.float32)
    g = rng.normal(size=10).astype(np.float32)
    x = np.array(linalg.solve_chol(jnp.array(H), jnp.array(g)))
    np.testing.assert_allclose(H @ x, g, rtol=1e-3, atol=1e-3)


def test_lstsq_chol():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(1, 50, 8)).astype(np.float32)
    x_true = rng.normal(size=(1, 8, 1)).astype(np.float32)
    b = A @ x_true
    x = np.array(linalg.lstsq_chol(jnp.array(A), jnp.array(b)))
    np.testing.assert_allclose(x, x_true, rtol=1e-3, atol=1e-3)


def test_cholesky_inverse():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(2, 6, 6)).astype(np.float32)
    H = A @ A.swapaxes(-1, -2) + 5 * np.eye(6, dtype=np.float32)
    L = np.linalg.cholesky(H)
    Hinv = np.array(linalg.cholesky_inverse(jnp.array(L)))
    np.testing.assert_allclose(H @ Hinv, np.tile(np.eye(6), (2, 1, 1)), atol=1e-4)


def test_inv2x2():
    rng = np.random.default_rng(4)
    M = rng.normal(size=(5, 2, 2)).astype(np.float32)
    M = M @ M.swapaxes(-1, -2) + 2 * np.eye(2, dtype=np.float32)
    inv, dets = linalg.inv2x2(jnp.array(M))
    np.testing.assert_allclose(np.array(inv), np.linalg.inv(M), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.array(dets), np.linalg.det(M), rtol=1e-4)
