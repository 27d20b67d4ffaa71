"""Anchor correspondence + new-landmark initialization on keyframe insertion.

Spec: reference como/odom/frontend/corr.py (track_and_init): when a new
keyframe arrives, reproject the previous KF's anchors and dense depth
into it, re-distill anchor log-depths from the reprojected cloud through
the new frame's GP, keep anchors that pass a two-sided log-depth
consistency check + a log-depth-gradient discontinuity filter, subsample
the survivors by greedy conditional entropy, then sample new anchors to
fill the budget and solve their depths conditioned on the tracked ones.

Static-shape redesign: anchor sets stay (M,) with masks; the reference's
boolean filtering becomes weighting (distill) and sentinel placement
(invalid anchors are parked at distinct far-away coordinates so their
kernel columns decouple); the greedy sampler consumes packed prefixes.
Outputs carry the tracked-slot -> old-anchor-index permutation needed for
landmark inheritance.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from como_tpu.geometry import lie
from como_tpu.gp import distill, kernels, predictor, sampler
from como_tpu.ops import image as img_ops
from como_tpu.ops.coords import coord_grid_rc, normalize_coords
from como_tpu.ops.interp import bilinear_sample
from como_tpu.ops.linalg import masked_median as linalg_masked_median

HIGH = jax.lax.Precision.HIGHEST


class CorrResult(NamedTuple):
    coords_all: jax.Array    # (M, 2) anchor pixels (xy) in the NEW keyframe
    z_all: jax.Array         # (M,) anchor depths in the new keyframe
    tracked: jax.Array       # (M,) bool: slot is a tracked correspondence
    src_anchor: jax.Array    # (M,) int32: old-KF anchor index for tracked
    valid: jax.Array         # (M,) slot validity (all True normally)


def _reproject(pm_xy, z, Tji, K):
    ray = jnp.stack([(pm_xy[..., 0] - K[0, 2]) / K[0, 0],
                     (pm_xy[..., 1] - K[1, 2]) / K[1, 1],
                     jnp.ones_like(z)], -1)
    P = z[..., None] * ray
    Pj = jnp.einsum("ij,nj->ni", Tji[:3, :3], P, precision=HIGH) + Tji[:3, 3]
    zj = Pj[..., 2]
    zs = jnp.where(jnp.abs(zj) > 1e-9, zj, 1e-9)
    pj = jnp.stack([K[0, 0] * Pj[..., 0] / zs + K[0, 2],
                    K[1, 1] * Pj[..., 1] / zs + K[1, 2]], -1)
    return pj, zj


def _corr_errors(z_a, z_b, pix_xy, K, mode: str):
    """Correspondence error between two depth estimates at the same pixel
    (reference get_correspondence_errors, corr.py:46-57): "z" absolute
    depth difference, "logz" absolute log-depth difference, "3d" distance
    between the two backprojected points (= |z_a - z_b| * |ray|)."""
    if mode == "logz":
        return jnp.abs(jnp.log(jnp.maximum(z_a, 1e-9))
                       - jnp.log(jnp.maximum(z_b, 1e-9)))
    if mode == "z":
        return jnp.abs(z_a - z_b)
    if mode == "3d":
        rx = (pix_xy[..., 0] - K[0, 2]) / K[0, 0]
        ry = (pix_xy[..., 1] - K[1, 2]) / K[1, 1]
        ray_norm = jnp.sqrt(rx * rx + ry * ry + 1.0)
        return jnp.abs(z_a - z_b) * ray_norm
    raise ValueError(f"unknown corr_mode '{mode}'")


@partial(jax.jit, static_argnames=("M", "cfg"))
def track_and_init(pose1, pose2, pm1_xy, logzm1, depth_img1, cov_img2,
                   K, scale, M: int, cfg, key=None) -> CorrResult:
    """cfg: hashable CorrStatic (thresholds).  depth_img1 (H, W).
    key: PRNG key, used only when cfg.sample_mode == "random_uniform"."""
    H, W = depth_img1.shape
    dtype = depth_img1.dtype
    Tji = lie.invert_se3(pose2) @ pose1
    Tij = lie.invert_se3(Tji)

    # -- reproject anchors + dense cloud into the new frame ------------------
    zm1 = jnp.exp(logzm1)
    pj_m, zj_m = _reproject(pm1_xy, zm1, Tji, K)
    rc = coord_grid_rc((H, W), dtype=dtype)
    xy_n = jnp.stack([rc[:, 1], rc[:, 0]], -1)
    z_n1 = depth_img1.reshape(-1)
    pj_n, zj_n = _reproject(xy_n, z_n1, Tji, K)

    def interior(p, z):
        return ((p[..., 0] >= 1) & (p[..., 0] < W - 1)
                & (p[..., 1] >= 1) & (p[..., 1] < H - 1)
                & (z > cfg.min_obs_depth))

    mask_m = interior(pj_m, zj_m)
    mask_n = interior(pj_n, zj_n)

    # visibility (z-buffer) filter on the reprojected dense cloud: points of
    # the old KF that are *occluded* in the new frame land on top of their
    # occluder's pixels and would bias the distill toward phantom depths on
    # worlds with occlusions.  Scatter-min per target pixel, keep points
    # within 20% of the front surface.  (The reference distills from the
    # raw cloud — its trained anisotropic kernels absorb some of this; the
    # explicit filter is the geometry-first equivalent.)
    px = jnp.clip(jnp.round(pj_n[:, 0]).astype(jnp.int32), 0, W - 1)
    py = jnp.clip(jnp.round(pj_n[:, 1]).astype(jnp.int32), 0, H - 1)
    flat = py * W + px
    zbuf = jnp.full((H * W,), jnp.inf, dtype).at[flat].min(
        jnp.where(mask_n, zj_n, jnp.inf))
    front = zj_n <= 1.2 * zbuf[flat]
    mask_n = mask_n & front

    # park invalid anchors at distinct far coords so their kernel columns
    # decouple (static-shape replacement for the reference's row filtering)
    sent = jnp.stack([-10.0 - 3.0 * jnp.arange(M, dtype=dtype),
                      jnp.full((M,), -10.0, dtype)], -1)
    coords_m_norm = jnp.where(mask_m[:, None],
                              normalize_coords(jnp.stack([pj_m[:, 1], pj_m[:, 0]], -1),
                                               jnp.array([H, W], dtype=dtype)),
                              sent)
    coords_n_norm = normalize_coords(jnp.stack([pj_n[:, 1], pj_n[:, 0]], -1),
                                     jnp.array([H, W], dtype=dtype))

    # -- GP distill of tracked anchor depths --------------------------------
    e_m = kernels.interpolate_cov_params(cov_img2, coords_m_norm)
    e_n = cov_img2.reshape(3, -1).T
    K_mm, K_nm, K_nn_diag = predictor.kernel_matrices(
        coords_m_norm, e_m, coords_n_norm, e_n, scale)
    pred = predictor.build_predictor(K_mm, K_nm, jitter=1e-6)
    stdev_inv = predictor.predictive_stdev_inv(K_nm, pred.Knm_Kmminv, K_nn_diag)
    logz_obs = jnp.log(jnp.maximum(zj_n, 1e-9))
    logz_m, resid = distill.distill_depth(
        pred.Knm_Kmminv, logz_obs, mask_n,
        with_prior=cfg.distill_with_prior, L_mm=pred.L_mm, stdev_inv_obs=stdev_inv)
    z_m = jnp.exp(logz_m)

    # -- two-sided consistency + discontinuity filters -----------------------
    err_j = _corr_errors(zj_m, z_m, pj_m, K, cfg.corr_mode)
    pi_m, zi_m = _reproject(pj_m, z_m, Tij, K)
    z_back = bilinear_sample(depth_img1[None], pi_m, padding="zeros")[0]
    err_i = _corr_errors(z_back, zi_m, pi_m, K, cfg.corr_mode)
    corr_err = jnp.maximum(err_i, err_j)

    logd = jnp.log(jnp.maximum(depth_img1, 1e-9))[None, None]
    lgx, lgy = img_ops.image_gradients(logd)
    gmag = jnp.sqrt(lgx[0, 0] ** 2 + lgy[0, 0] ** 2)
    gref = bilinear_sample(gmag[None], pm1_xy, padding="zeros")[0]

    cand = (mask_m & (corr_err < cfg.corr_thresh)
            & (gref < cfg.logz_grad_mag_thresh))

    # -- subsample tracked candidates (sampling.mode dispatch; reference
    # samplers.sample_sparse_coords:36-107) ----------------------------------
    if cfg.sample_mode == "random_uniform":
        k_keep, k_new = jax.random.split(
            key if key is not None else jax.random.PRNGKey(0))
        keep_idx, keep_valid = sampler.random_uniform_sample(k_keep, cand, M)
        keep_idx = jnp.where(keep_valid, keep_idx, 0)
        n_keep = jnp.sum(keep_valid)
    else:
        res_keep = sampler.greedy_entropy_sample(
            coords_m_norm, e_m, cand,
            jnp.zeros((M, 2), dtype), jnp.zeros((M, 3), dtype),
            jnp.zeros((M,), bool), jnp.zeros((M,), dtype),
            signal_var=scale, fixed_var=cfg.fixed_var,
            max_stdev_thresh=cfg.max_stdev_thresh, dist_thresh=cfg.dist_thresh,
            num_slots=M, terminate_early=True,
        )
        keep_idx = jnp.where(res_keep.is_new, res_keep.domain_inds, 0)
        n_keep = jnp.sum(res_keep.is_new)

    # packed tracked prefix: slot s (< n_keep) <- candidate keep_idx[s]
    tracked_slot = jnp.arange(M) < n_keep
    src_anchor = jnp.where(tracked_slot, keep_idx, -1).astype(jnp.int32)
    coords_tr_norm = jnp.where(tracked_slot[:, None], coords_m_norm[keep_idx], sent)
    e_tr = e_m[keep_idx]
    z_tr = z_m[keep_idx]

    # -- fill remaining slots with new anchors over the full image -----------
    dom_norm, e_dom, dom_valid, dom_rc = sampler.full_image_domain(
        cov_img2, border=cfg.border)
    if cfg.sample_mode == "random_uniform":
        new_idx, new_valid = sampler.random_uniform_sample(k_new, dom_valid, M)
        new_domain_inds = jnp.where(new_valid, new_idx, 0)
        new_slot = ~tracked_slot & new_valid
        coords_all_norm = jnp.where(tracked_slot[:, None], coords_tr_norm,
                                    dom_norm[new_domain_inds])
        e_all = jnp.where(tracked_slot[:, None], e_tr, e_dom[new_domain_inds])
    else:
        res_new = sampler.greedy_entropy_sample(
            dom_norm, e_dom, dom_valid,
            coords_tr_norm, e_tr, tracked_slot, jnp.zeros((M,), dtype),
            signal_var=scale, fixed_var=cfg.fixed_var,
            max_stdev_thresh=cfg.max_stdev_thresh, dist_thresh=cfg.dist_thresh,
            num_slots=M, terminate_early=False,
        )
        new_domain_inds = jnp.maximum(res_new.domain_inds, 0)
        new_slot = res_new.is_new                         # (M,)
        coords_all_norm = jnp.where(tracked_slot[:, None], coords_tr_norm,
                                    res_new.coords_norm)
        e_all = jnp.where(tracked_slot[:, None], e_tr, res_new.covs)

    # -- conditional distill for the new anchors -----------------------------
    K_mm2, K_nm2, _ = predictor.kernel_matrices(
        coords_all_norm, e_all, coords_n_norm, e_n, scale)
    pred2 = predictor.build_predictor(K_mm2, K_nm2, jitter=1e-6)
    resid_var = jnp.sum(jnp.square(resid) * mask_n) / jnp.maximum(
        jnp.sum(mask_n) - 1, 1)
    sigma_r = jnp.sqrt(resid_var) + 1e-9
    logz1 = jnp.where(tracked_slot, jnp.log(jnp.maximum(z_tr, 1e-9)), 0.0)
    logz2 = distill.distill_conditional_depth(
        pred2.Knm_Kmminv, logz_obs, mask_n & (zj_n > 0.0), logz1, tracked_slot,
        jnp.full_like(logz_obs, 1.0 / sigma_r), sigma_median=cfg.sigma_median)

    z_all = jnp.where(tracked_slot, z_tr, jnp.exp(logz2))
    # sanity: any non-finite / non-positive depth falls back to the median
    # of the observed cloud (in-algorithm robustness; cf. the reference's
    # behind-camera reinit)
    z_med = jnp.exp(linalg_masked_median(logz_obs, mask_n))
    # if the observation cloud itself degenerated (e.g. nothing reprojects
    # into the new frame), fall back to the old KF's anchor median so the
    # insertion stays finite instead of poisoning the window
    z_med = jnp.where(jnp.isfinite(z_med) & (z_med > 1e-4), z_med,
                      jnp.exp(jnp.median(logzm1)))
    z_ok = jnp.isfinite(z_all) & (z_all > 1e-4) & (z_all < 1e4)
    z_all = jnp.where(z_ok, z_all, z_med)
    # new-anchor pixel coords from the sampler's domain grid
    rc_all = jnp.where(
        tracked_slot[:, None],
        jnp.stack([pj_m[keep_idx][:, 1], pj_m[keep_idx][:, 0]], -1),
        dom_rc[new_domain_inds],
    )
    coords_all_xy = jnp.stack([rc_all[:, 1], rc_all[:, 0]], -1)

    return CorrResult(coords_all=coords_all_xy, z_all=z_all,
                      tracked=tracked_slot, src_anchor=src_anchor,
                      valid=tracked_slot | new_slot)


class CorrStatic(NamedTuple):
    corr_thresh: float = 3e-2
    min_obs_depth: float = 0.0
    logz_grad_mag_thresh: float = 7e-2
    distill_with_prior: bool = True
    max_stdev_thresh: float = 1e-2
    border: int = 3
    dist_thresh: float = 1e-1
    fixed_var: float = 0.0
    sigma_median: float = 5e-2
    # correspondence error metric: "z" | "logz" | "3d" (cfg.corr.corr_mode)
    corr_mode: str = "logz"
    # anchor sampler: "greedy_conditional_entropy" | "random_uniform"
    # (cfg.sampling.mode)
    sample_mode: str = "greedy_conditional_entropy"
