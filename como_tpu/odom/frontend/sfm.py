"""Two-frame SfM bootstrap: joint GN over (pose, anchor log-depths).

Spec: reference como/odom/frontend/{TwoFrameSfm.py,two_frame_sfm.py}:
monocular initialization against a reference frame — coarse-to-fine GN
over the 6-DoF relative pose and the M anchor log-depths, with a
photometric term whose depth Jacobian flows through the GP predictor,
a GP sparse-depth prior (L_mm^-1 whitening), and a mean-log-depth = 0
prior that fixes the monocular scale.  Affine brightness is carried but
not optimized (as in the reference).

TPU redesign: per-level while_loops on device, static all-pixel sample
sites per level, factored depth chain (dI/d(logzm) = s_n * W[n, :]) so
the (6+M) Hessian assembles from (N, M) matmuls.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from como_tpu.geometry import lie
from como_tpu.gp import kernels, predictor
from como_tpu.ops import image as img_ops
from como_tpu.ops.coords import coord_grid_rc, normalize_coords, fill_image
from como_tpu.ops.interp import bilinear_sample
from como_tpu.ops.reduce import fast_mad_sigma, histogram_median
from como_tpu.odom.frontend.tracking_kernels import huber_weight

HIGH = jax.lax.Precision.HIGHEST


class SfmLevel(NamedTuple):
    vals: jax.Array       # (N,) reference intensities (all pixels of level)
    rays: jax.Array       # (N, 3) unit-z rays of level pixels
    W: jax.Array          # (N, M) Knm Kmm^-1 predictor rows
    K: jax.Array          # (3, 3) level intrinsics


class SfmRef(NamedTuple):
    levels: Sequence[SfmLevel]
    Kmm_inv: jax.Array    # (M, M)
    L_mm: jax.Array
    coords_m_xy: jax.Array  # (M, 2) anchor pixels (full res)


@partial(jax.jit, static_argnames=("start_level", "end_level"))
def setup_reference(rgb, cov_img, coords_m_rc, K, scale,
                    start_level: int, end_level: int) -> SfmRef:
    """Precompute per-level predictor rows + GP prior linearization
    (reference two_frame_sfm.setup_reference)."""
    H, W_img = rgb.shape[-2:]
    dtype = rgb.dtype
    gray = img_ops.rgb_to_gray(rgb)
    img_pyr = img_ops.image_pyramid(gray, start_level, end_level)
    K_pyr = img_ops.intrinsics_pyramid(K, start_level, end_level)

    coords_m_norm = normalize_coords(coords_m_rc, jnp.array([H, W_img], dtype))
    e_m = kernels.interpolate_cov_params(cov_img, coords_m_norm)
    K_mm = kernels.cross_covariance(coords_m_norm, e_m, coords_m_norm, e_m, scale)
    M = K_mm.shape[0]
    # scale-adaptive jitter: wide learned kernels make K_mm near rank-1, and
    # a fixed 1e-6 floor leaves ||K_mm^-1|| ~ 1e6 — enough to drown the
    # scale-gauge curvature in the f32 GN solve below
    jitter = 1e-6 + 1e-4 * jnp.mean(jnp.diagonal(K_mm))
    L_mm = jnp.linalg.cholesky(K_mm + jitter * jnp.eye(M, dtype=dtype))
    from como_tpu.ops.linalg import cholesky_inverse
    Kmm_inv = cholesky_inverse(L_mm)

    levels = []
    for img_l, K_l in zip(img_pyr, K_pyr):
        h, w = img_l.shape[-2:]
        rc = coord_grid_rc((h, w), dtype)
        norm = normalize_coords(rc, jnp.array([h, w], dtype))
        e_n = kernels.interpolate_cov_params(cov_img, norm)
        K_nm = kernels.cross_covariance(norm, e_n, coords_m_norm, e_m, scale)
        W_l = jnp.matmul(K_nm, Kmm_inv, precision=HIGH)
        rays = jnp.stack([(rc[:, 1] - K_l[0, 2]) / K_l[0, 0],
                          (rc[:, 0] - K_l[1, 2]) / K_l[1, 1],
                          jnp.ones((h * w,), dtype)], -1)
        levels.append(SfmLevel(vals=img_l.reshape(-1), rays=rays, W=W_l, K=K_l))
    return SfmRef(levels=levels, Kmm_inv=Kmm_inv, L_mm=L_mm,
                  coords_m_xy=jnp.stack([coords_m_rc[:, 1], coords_m_rc[:, 0]], -1))


def _level_gn(Tji, logzm, lvl: SfmLevel, img_j3, Kmm_inv, L_mm, term):
    """While-loop GN on one pyramid level.  img_j3: (3, h, w) = I, gx, gy."""
    M = logzm.shape[0]
    h, w = img_j3.shape[-2:]
    K_l = lvl.K
    fx, fy, cx, cy = K_l[0, 0], K_l[1, 1], K_l[0, 2], K_l[1, 2]
    dtype = logzm.dtype
    D = 6 + M
    colmean = jnp.mean(lvl.W, axis=0)  # mean-log-depth prior linearization

    def iter_fn(Tji, logzm):
        logz_n = jnp.matmul(lvl.W, logzm, precision=HIGH)   # (N,)
        z_n = jnp.exp(logz_n)
        Pi = z_n[:, None] * lvl.rays
        R, t = Tji[:3, :3], Tji[:3, 3]
        Pj = jnp.einsum("ij,nj->ni", R, Pi, precision=HIGH) + t
        zj = Pj[:, 2]
        zs = jnp.where(jnp.abs(zj) > 1e-9, zj, 1e-9)
        px = fx * Pj[:, 0] / zs + cx
        py = fy * Pj[:, 1] / zs + cy
        samp = bilinear_sample(img_j3, jnp.stack([px, py], -1), "zeros")
        I_t, gx, gy = samp[0], samp[1], samp[2]
        valid = ((px >= 1) & (px < w - 1) & (py >= 1) & (py < h - 1) & (zj > 0))
        r = I_t - lvl.vals

        sigma = fast_mad_sigma(r, valid) + 1e-12
        wgt = huber_weight(r / sigma) * valid / (sigma * sigma)

        # Jacobians
        a2 = jnp.stack([gx * fx, gy * fy], -1) / zs[:, None]
        dI_dPj = jnp.stack([a2[:, 0], a2[:, 1],
                            -(a2[:, 0] * (px - cx) / fx + a2[:, 1] * (py - cy) / fy)], -1)
        # pose: dPj/dxi = [-R skew(Pi), R] (right-update Tji exp(xi))
        aR = jnp.einsum("nc,ci->ni", dI_dPj, R, precision=HIGH)
        J_T = jnp.concatenate([jnp.cross(Pi, aR), aR], -1)   # (N, 6)
        # depth: dI/dlogzm = (dI_dPj . R rays z) * W[n, :]
        s = jnp.einsum("ni,ni->n", aR, lvl.rays * z_n[:, None])
        # assemble H, g
        Jw = J_T * wgt[:, None]
        H_TT = jnp.einsum("nk,nl->kl", Jw, J_T, precision=HIGH)
        H_Td = jnp.matmul((Jw * s[:, None]).T, lvl.W, precision=HIGH)  # (6, M)
        H_dd = jnp.matmul((lvl.W * (wgt * s * s)[:, None]).T, lvl.W, precision=HIGH)
        g_T = -jnp.einsum("nk,n->k", J_T, wgt * r, precision=HIGH)
        g_d = -jnp.matmul(lvl.W.T, (wgt * s * r)[:, None], precision=HIGH)[:, 0]
        photo_err = jnp.sum(wgt * r * r)

        # GP sparse depth prior: r = L^-1 logzm  ->  H += K^-1, g -= K^-1 logzm
        Kinv_lz = jnp.matmul(Kmm_inv, logzm[:, None], precision=HIGH)[:, 0]
        H_dd = H_dd + Kmm_inv
        g_d = g_d - Kinv_lz
        prior_err = jnp.dot(logzm, Kinv_lz)

        # mean-log-depth gauge prior: r = mean(logz_n).  The reference
        # weighs this scalar with sigma=1 (two_frame_sfm.py:360-362), which
        # holds only because its kernels keep depth observable; with wide
        # learned kernels the dense depth is near-constant and the photo
        # term pushes the (monocularly unobservable) scale around freely —
        # so pin the gauge with information proportional to the photometric
        # row count.  Along a true gauge direction this costs nothing.
        w_mean = jnp.asarray(lvl.vals.shape[0], dtype)
        mean_r = jnp.mean(logz_n)
        H_dd = H_dd + w_mean * jnp.outer(colmean, colmean)
        g_d = g_d - w_mean * colmean * mean_r
        mean_err = w_mean * mean_r * mean_r

        H = jnp.zeros((D, D), dtype)
        H = H.at[:6, :6].set(H_TT).at[:6, 6:].set(H_Td).at[6:, :6].set(H_Td.T)
        H = H.at[6:, 6:].add(H_dd)
        g = jnp.concatenate([g_T, g_d])
        # Jacobi-preconditioned solve: H entries span ~1e-4 (mean-depth
        # gauge pin) to ~1e4+ (K_mm^-1 with wide kernels); an unscaled f32
        # Cholesky loses the gauge curvature entirely and the step can jump
        # along the monocular scale direction.  Symmetric diagonal scaling
        # is exact (not an approximation) and makes the factorization
        # scale-invariant.
        dsc = jax.lax.rsqrt(jnp.abs(jnp.diagonal(H)) + 1e-12)
        Hs = H * dsc[:, None] * dsc[None, :] + 1e-7 * jnp.eye(D, dtype=dtype)
        Lc = jnp.linalg.cholesky(Hs)
        yv = jax.scipy.linalg.solve_triangular(Lc, (g * dsc)[:, None],
                                               lower=True)
        delta = jax.scipy.linalg.solve_triangular(Lc.T, yv, lower=False)[:, 0]
        delta = delta * dsc
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)

        # trust region: cap the pose step and per-anchor log-depth steps.
        # Normal convergence takes steps far below these caps; what they
        # prevent is the single-iteration overshoot along near-singular
        # directions that warps the frame out of overlap and forces a
        # bootstrap reseed (mapping's GN has the same guard on landmarks).
        dT = delta[:6]
        dT = dT * jnp.minimum(1.0, 1.0 / jnp.maximum(
            jnp.linalg.norm(dT), 1e-12))
        dz = jnp.clip(delta[6:], -0.5, 0.5)

        Tji_new = Tji @ lie.se3_exp(dT)
        logzm_new = logzm + dz
        total = photo_err + prior_err + mean_err
        return Tji_new, logzm_new, jnp.linalg.norm(delta[:6]), total

    def cond(st):
        return jnp.logical_not(st[4])

    def body(st):
        Tji, logzm, it, prev, _ = st
        Tji2, logzm2, dn, tot = iter_fn(Tji, logzm)
        it2 = it + 1
        dec = prev - tot
        rel = jnp.abs(dec) / jnp.maximum(prev, 1e-20)
        done = ((it2 >= term["max_iter"]) | (dn < term["delta_norm"])
                | ((rel < term["rel_tol"]) & (dec > 0)))
        return (Tji2, logzm2, it2, tot, done)

    st = lax.while_loop(cond, body,
                        (Tji, logzm, jnp.int32(0), jnp.asarray(jnp.inf, dtype),
                         jnp.asarray(False)))
    return st[0], st[1]


@partial(jax.jit, static_argnames=("term",))
def sfm_align(ref: SfmRef, img_pyr_j3, Tji_init, logzm_init, term):
    """Coarse-to-fine joint pose+depth GN; returns (Tji, logzm,
    mean_log_depth, reproj coverage count, median reprojected depth)."""
    Tji, logzm = Tji_init, logzm_init
    for lvl, img_j3 in zip(ref.levels, img_pyr_j3):
        Tji, logzm = _level_gn(Tji, logzm, lvl, img_j3, ref.Kmm_inv, ref.L_mm,
                               dict(term))
    fin = ref.levels[-1]
    logz_n = jnp.matmul(fin.W, logzm, precision=HIGH)
    mean_log_depth = jnp.mean(logz_n)
    # coverage of current frame by the reference cloud (for init decisions,
    # reference TwoFrameSfm.handle_frame:44-66)
    z_n = jnp.exp(logz_n)
    Pi = z_n[:, None] * fin.rays
    R, t = Tji[:3, :3], Tji[:3, 3]
    Pj = jnp.einsum("ij,nj->ni", R, Pi, precision=HIGH) + t
    zj = Pj[:, 2]
    zs = jnp.where(jnp.abs(zj) > 1e-9, zj, 1e-9)
    K_l = fin.K
    px = K_l[0, 0] * Pj[:, 0] / zs + K_l[0, 2]
    py = K_l[1, 1] * Pj[:, 1] / zs + K_l[1, 2]
    h, w = img_pyr_j3[-1].shape[-2:]
    valid = (px >= 0) & (px <= w - 1) & (py >= 0) & (py <= h - 1) & (zj > 0)
    rc = jnp.where(valid[:, None], jnp.stack([py, px], -1), -1.0)
    img = fill_image(rc, zj, (h, w), default_val=jnp.nan)
    filled = jnp.logical_not(jnp.isnan(img))
    count = jnp.sum(filled)
    med = histogram_median(jnp.where(filled, img, 0.0), filled)
    return Tji, logzm, mean_log_depth, count, med
