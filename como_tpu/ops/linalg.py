"""Linear-algebra helpers: masked robust statistics + Cholesky utilities.

Reference spec: como/utils/lin_alg.py (lstsq_chol, 2x2 helpers) plus the
masked median machinery needed because the reference computes MAD sigmas
over *variable-size* valid subsets (torch.median over boolean-indexed
tensors) while we keep static shapes with validity masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

HIGH = lax.Precision.HIGHEST


def masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Median over x[mask] with static shapes (lower-middle element, torch
    semantics: median of n elements = sorted[(n-1)//2])."""
    x_flat = x.reshape(-1)
    m_flat = mask.reshape(-1)
    big = jnp.asarray(jnp.finfo(x_flat.dtype).max, x_flat.dtype)
    xs = jnp.sort(jnp.where(m_flat, x_flat, big))
    n = jnp.sum(m_flat)
    idx = jnp.maximum(n - 1, 0) // 2
    return xs[idx]


def masked_mad_sigma(r: jax.Array, mask: jax.Array) -> jax.Array:
    """1.4826 * median(|r[mask]|)  (robust sigma used across the reference)."""
    return 1.4826 * masked_median(jnp.abs(r), mask)


def solve_chol(H: jax.Array, g: jax.Array, damping: float = 0.0) -> jax.Array:
    """Solve H x = g via Cholesky; optional Tikhonov damping on the diagonal.

    (reference solve_delta / lin_sys.solve_system — dense cholesky_ex +
    cholesky_solve; we add small damping as the f32 safety net.)
    """
    if damping:
        H = H + damping * jnp.eye(H.shape[-1], dtype=H.dtype)
    L = jnp.linalg.cholesky(H)
    y = jax.scipy.linalg.solve_triangular(L, g[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(L.swapaxes(-1, -2), y, lower=False)
    return x[..., 0]


def cholesky_inverse(L: jax.Array) -> jax.Array:
    """A^-1 from its lower Cholesky factor (reference chol_to_inverse)."""
    m = L.shape[-1]
    I = jnp.broadcast_to(jnp.eye(m, dtype=L.dtype), L.shape)
    y = jax.scipy.linalg.solve_triangular(L, I, lower=True)
    return jax.scipy.linalg.solve_triangular(L.swapaxes(-1, -2), y, lower=False)


def lstsq_chol(A: jax.Array, b: jax.Array) -> jax.Array:
    """argmin ||A x - b|| via normal equations + Cholesky (reference lstsq_chol)."""
    At = A.swapaxes(-1, -2)
    ATA = jnp.matmul(At, A, precision=HIGH)
    ATb = jnp.matmul(At, b, precision=HIGH)
    L = jnp.linalg.cholesky(ATA)
    y = jax.scipy.linalg.solve_triangular(L, ATb, lower=True)
    return jax.scipy.linalg.solve_triangular(L.swapaxes(-1, -2), y, lower=False)


def tri_solve_lower(L: jax.Array, B: jax.Array) -> jax.Array:
    return jax.scipy.linalg.solve_triangular(L, B, lower=True)


def det2x2(mats: jax.Array) -> jax.Array:
    return mats[..., 0, 0] * mats[..., 1, 1] - mats[..., 0, 1] * mats[..., 1, 0]


def inv2x2(mats: jax.Array):
    dets = det2x2(mats)
    inv = jnp.stack(
        [
            jnp.stack([mats[..., 1, 1], -mats[..., 0, 1]], axis=-1),
            jnp.stack([-mats[..., 1, 0], mats[..., 0, 0]], axis=-1),
        ],
        axis=-2,
    ) / dets[..., None, None]
    return inv, dets


def safe_sqrt(x: jax.Array) -> jax.Array:
    """sqrt(x + 1e-8) (reference como/utils/math.py)."""
    return jnp.sqrt(x + 1e-8)
