"""Depth distillation: fit sparse anchor log-depths to dense observations
through the GP predictor.

Spec: reference como/depth_cov/core/distill_depth.py.  Static-shape
redesign: the reference filters observation rows by a validity mask
(dynamic shapes); we instead weight rows — a zero-weighted row contributes
nothing to the normal equations, which is algebraically identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from como_tpu.ops import linalg

HIGH = jax.lax.Precision.HIGHEST


def _weighted_normal_solve(A: jax.Array, b: jax.Array, w: jax.Array) -> jax.Array:
    """argmin ||diag(w)(A x - b)||: solve A^T W^2 A x = A^T W^2 b."""
    Aw = A * w[..., None]
    bw = b * w[..., None] if b.ndim == A.ndim else b * w
    ATA = jnp.matmul(Aw.swapaxes(-1, -2), Aw, precision=HIGH)
    ATb = jnp.matmul(Aw.swapaxes(-1, -2), bw[..., None] if bw.ndim < A.ndim else bw,
                     precision=HIGH)
    ATA = ATA + 1e-10 * jnp.eye(ATA.shape[-1], dtype=ATA.dtype)
    L = jnp.linalg.cholesky(ATA)
    y = jax.scipy.linalg.solve_triangular(L, ATb, lower=True)
    return jax.scipy.linalg.solve_triangular(L.swapaxes(-1, -2), y, lower=False)


def distill_depth(Knm_Kmminv: jax.Array, logz_obs: jax.Array, obs_mask: jax.Array,
                  with_prior: bool, L_mm: jax.Array | None = None,
                  stdev_inv_obs: jax.Array | None = None):
    """Solve for anchor log-depths logz_m from dense observed log-depths.

    Knm_Kmminv (N, M); logz_obs (N,); obs_mask (N,) bool; optional GP prior
    whitened by L_mm^-1 and per-obs stdev_inv (reference distill_depth).
    Returns (logz_m (M,), residuals (N,) = pred - obs, masked rows zeroed).
    """
    n, m = Knm_Kmminv.shape
    w_obs = obs_mask.astype(Knm_Kmminv.dtype)
    if stdev_inv_obs is not None:
        w_obs = w_obs * stdev_inv_obs

    if not with_prior:
        logz_m = _weighted_normal_solve(Knm_Kmminv, logz_obs, w_obs)[..., 0]
    else:
        I_m = jnp.eye(m, dtype=Knm_Kmminv.dtype)
        L_inv = linalg.tri_solve_lower(L_mm, I_m)
        A = jnp.concatenate([L_inv, Knm_Kmminv], axis=0)
        b = jnp.concatenate([jnp.zeros((m,), Knm_Kmminv.dtype), logz_obs], axis=0)
        w = jnp.concatenate([jnp.ones((m,), Knm_Kmminv.dtype), w_obs], axis=0)
        logz_m = _weighted_normal_solve(A, b, w)[..., 0]

    residuals = (Knm_Kmminv @ logz_m - logz_obs) * obs_mask
    return logz_m, residuals


def distill_conditional_depth(Knm_Kmminv: jax.Array, logz_obs: jax.Array,
                              obs_mask: jax.Array, logz1: jax.Array,
                              m1_mask: jax.Array, stdev_inv_obs: jax.Array,
                              sigma_median: float = 5e-2):
    """Solve for *new* anchor depths conditioned on tracked anchors, with a
    median-depth prior on the new ones (reference
    distill_conditional_depth_with_scale_prior, incl. sigma_median=5e-2).

    Static-shape variant: all M anchor columns are present; m1_mask (M,)
    marks tracked anchors (depth fixed to logz1), ~m1_mask marks new ones.
    logz1 (M,) carries tracked log-depths at tracked slots (zeros elsewhere).
    Returns logz2 (M,) with solved values at new slots (zeros at tracked).
    """
    n, m = Knm_Kmminv.shape
    dtype = Knm_Kmminv.dtype
    w1 = m1_mask.astype(dtype)
    w2 = 1.0 - w1

    # median log depth of valid observations — scale prior target
    s = linalg.masked_median(logz_obs, obs_mask)
    stdev_inv_prior = 1.0 / sigma_median

    # Observation block: logz_obs - K[:, tracked] @ logz1 ≈ K[:, new] @ logz2
    A_obs = Knm_Kmminv * w2[None, :]
    b_obs = logz_obs - Knm_Kmminv @ (logz1 * w1)
    w_obs = obs_mask.astype(dtype) * stdev_inv_obs

    # Prior block: identity on the new anchors toward s
    A_pri = jnp.eye(m, dtype=dtype) * w2[None, :]
    b_pri = jnp.full((m,), s, dtype=dtype)
    w_pri = stdev_inv_prior * w2

    A = jnp.concatenate([A_pri, A_obs], axis=0)
    b = jnp.concatenate([b_pri, b_obs], axis=0)
    w = jnp.concatenate([w_pri, w_obs], axis=0)
    # tracked columns have zero weight everywhere -> pin them via tiny ridge;
    # add identity rows with weight 1 on tracked slots mapping to 0.
    A_fix = jnp.eye(m, dtype=dtype) * w1[None, :]
    A = jnp.concatenate([A, A_fix], axis=0)
    b = jnp.concatenate([b, jnp.zeros((m,), dtype)], axis=0)
    w = jnp.concatenate([w, w1], axis=0)

    logz2 = _weighted_normal_solve(A, b, w)[..., 0]
    return logz2 * w2
