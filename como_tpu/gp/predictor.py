"""GP depth predictor: conditioning machinery shared by mapping + SfM.

Spec: reference como/depth_cov/core/distill_depth.py:29-48 (get_predictor)
and como/odom/Mapping.py:430-468 (prep_predictor).  Everything is static
shape: M anchors, N test sites.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from como_tpu.gp import kernels
from como_tpu.ops import linalg

HIGH = jax.lax.Precision.HIGHEST


class GPPredictor(NamedTuple):
    """Per-keyframe GP conditioning state (all static shapes)."""
    Kmm_inv: jax.Array      # (M, M)
    L_mm: jax.Array         # (M, M) lower Cholesky of K_mm (+jitter)
    Knm_Kmminv: jax.Array   # (N, M) dense-image predictor


def kernel_matrices(x_m_norm, e_m, x_n_norm, e_n, scale):
    """K_mm (M, M), K_nm (N, M), K_nn_diag (N,) for anchor/test site sets.

    The large N x M cross block uses the fused Pallas kernel on TPU
    (gp/kernels_pallas.py); small blocks stay XLA."""
    from como_tpu.gp import kernels_pallas

    K_mm = kernels.cross_covariance(x_m_norm, e_m, x_m_norm, e_m, scale)
    if x_n_norm.shape[0] >= 4096:
        K_nm = kernels_pallas.cross_covariance(x_n_norm, e_n, x_m_norm, e_m,
                                               scale)
    else:
        K_nm = kernels.cross_covariance(x_n_norm, e_n, x_m_norm, e_m, scale)
    K_nn_diag = kernels.diag_covariance(e_n, scale)
    return K_mm, K_nm, K_nn_diag


def build_predictor(K_mm: jax.Array, K_nm: jax.Array, jitter: float = 1e-6) -> GPPredictor:
    m = K_mm.shape[-1]
    K_mm = K_mm + jitter * jnp.eye(m, dtype=K_mm.dtype)
    L_mm = jnp.linalg.cholesky(K_mm)
    Kmm_inv = linalg.cholesky_inverse(L_mm)
    Knm_Kmminv = jnp.matmul(K_nm, Kmm_inv, precision=HIGH)
    return GPPredictor(Kmm_inv=Kmm_inv, L_mm=L_mm, Knm_Kmminv=Knm_Kmminv)


def predictive_stdev_inv(K_nm, Knm_Kmminv, K_nn_diag):
    """1/sqrt(var) of the GP posterior at test sites, with the reference's
    positivity fixup (var += min(var) + 1e-8; distill_depth.py:43-47)."""
    var = K_nn_diag - jnp.sum(K_nm * Knm_Kmminv, axis=-1)
    var = var + jnp.min(var) + 1e-8
    return 1.0 / jnp.sqrt(var)


def predictor_from_cov_img(cov_img: jax.Array, coords_m_norm: jax.Array,
                           coords_n_norm: jax.Array, e_n: jax.Array | None,
                           scale, jitter: float = 1e-6):
    """Full pipeline from a packed (3, H, W) covariance image.

    If e_n is None, test covs are sampled from the image at coords_n_norm.
    Returns (GPPredictor, (K_mm, K_nm, K_nn_diag), e_m).
    """
    e_m = kernels.interpolate_cov_params(cov_img, coords_m_norm)
    if e_n is None:
        e_n = kernels.interpolate_cov_params(cov_img, coords_n_norm)
    K_mm, K_nm, K_nn_diag = kernel_matrices(coords_m_norm, e_m, coords_n_norm, e_n, scale)
    pred = build_predictor(K_mm, K_nm, jitter)
    return pred, (K_mm, K_nm, K_nn_diag), e_m
