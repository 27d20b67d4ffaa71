"""Probability-product Matern kernel over 2D Gaussian pixel sites.

The DepthCov prior models per-pixel 2x2 Gaussian covariances E; the GP
kernel between two sites is a Bhattacharyya probability-product kernel
(p = 1/2, Jebara et al. JMLR 2004) composed with a Matern nu=3/2 over
the induced Mahalanobis distance.  Spec: reference
como/depth_cov/core/kernels.py (Python twin) and
como/backend/src/cov_cpu.cpp:17-64 (native twin); both are reproduced
here as one fused elementwise XLA computation (TPU: pure VPU work that
XLA fuses; a Pallas variant lives in kernels_pallas.py).

Coordinates are *normalized* to [-1, 1] (grid_sample convention); E is
carried as packed components (e00, e11, e01) to keep layouts flat.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

SQRT3 = math.sqrt(3.0)
_EPS = 1e-8


def matern32(Q: jax.Array) -> jax.Array:
    """Matern nu=3/2 of a squared distance Q (with the reference's
    safe-sqrt epsilon so K(x,x) matches bit-for-bit behavior)."""
    t = SQRT3 * jnp.sqrt(Q + _EPS)
    return (1.0 + t) * jnp.exp(-t)


def pack_cov(E: jax.Array) -> jax.Array:
    """(..., 2, 2) -> (..., 3) packed (e00, e11, e01)."""
    return jnp.stack([E[..., 0, 0], E[..., 1, 1], E[..., 0, 1]], axis=-1)


def unpack_cov(e: jax.Array) -> jax.Array:
    """(..., 3) packed -> (..., 2, 2)."""
    e00, e11, e01 = e[..., 0], e[..., 1], e[..., 2]
    return jnp.stack(
        [jnp.stack([e00, e01], axis=-1), jnp.stack([e01, e11], axis=-1)], axis=-2
    )


def _pair_terms(x1, e1, x2, e2):
    """Broadcast pair terms for (..., N, ...) x (..., M, ...) grids.

    x1 (..., N, 2), e1 (..., N, 3) vs x2 (..., M, 2), e2 (..., M, 3):
    returns Q, C with shape (..., N, M).
    """
    d0 = x1[..., :, None, 0] - x2[..., None, :, 0]
    d1 = x1[..., :, None, 1] - x2[..., None, :, 1]
    s00 = e1[..., :, None, 0] + e2[..., None, :, 0]
    s11 = e1[..., :, None, 1] + e2[..., None, :, 1]
    s01 = e1[..., :, None, 2] + e2[..., None, :, 2]
    det_s = s00 * s11 - s01 * s01
    inv_det = 1.0 / det_s
    Q = 0.5 * inv_det * (s11 * d0 * d0 - 2.0 * s01 * d0 * d1 + s00 * d1 * d1)

    det1 = e1[..., 0] * e1[..., 1] - e1[..., 2] * e1[..., 2]
    det2 = e2[..., 0] * e2[..., 1] - e2[..., 2] * e2[..., 2]
    C = (2.0
         * jnp.power(det1[..., :, None] * det2[..., None, :], 0.25)
         * jnp.sqrt(jnp.maximum(inv_det, 0.0) + _EPS))
    return Q, C


def cross_covariance(x1: jax.Array, e1: jax.Array, x2: jax.Array, e2: jax.Array,
                     scale) -> jax.Array:
    """K12 (..., N, M) between site sets; packed-cov inputs.

    Equivalent of the reference native op como_backends.cross_covariance
    (cov_cpu.cpp:17-64 / cov_gpu.cu:18-55).
    """
    Q, C = _pair_terms(x1, e1, x2, e2)
    return scale * C * matern32(Q)


def diag_covariance(e: jax.Array, scale) -> jax.Array:
    """diag K(X, X) (..., N): Q = 0, C = 2 sqrt(det E)/safe_sqrt(det 2E).

    (reference diagonal_prob_product + DiagonalCovarianceModule)
    """
    det = e[..., 0] * e[..., 1] - e[..., 2] * e[..., 2]
    C = 2.0 * jnp.sqrt(det) / jnp.sqrt(4.0 * det + _EPS)
    return scale * C * matern32(jnp.zeros_like(det))


def interpolate_cov_params(cov_img: jax.Array, coords_norm: jax.Array) -> jax.Array:
    """Bilinearly sample a packed 3-channel covariance image at normalized
    coords -> packed covs (N, 3).

    cov_img: (3, H, W) channels (e00, e11, e01); coords_norm (N, 2) in rc
    ([-1,1]) order.  grid_sample(border, align_corners=False) parity via
    ops.interp (reference gaussian_kernel.interpolate_kernel_params, which
    samples a 4-channel full-matrix image with border padding).
    """
    from como_tpu.ops.coords import unnormalize_coords
    from como_tpu.ops.interp import bilinear_sample

    H, W = cov_img.shape[-2:]
    rc = unnormalize_coords(coords_norm, jnp.array([H, W], dtype=coords_norm.dtype))
    xy = jnp.stack([rc[..., 1], rc[..., 0]], axis=-1)
    vals = bilinear_sample(cov_img, xy, padding="border")  # (3, N)
    return vals.T
