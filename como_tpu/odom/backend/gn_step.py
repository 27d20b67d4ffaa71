"""One sliding-window Gauss-Newton step — a single jitted function.

Spec (what): reference como/odom/Mapping.py:760-968 (iterate) +
como/odom/backend/{photo.py,linear_system.py,sparse_map.py} +
como/odom/factors/*.py: dense photometric BA over keyframe pairs and
one-way frames, jointly optimizing SE(3) poses, affine brightness, and
sparse 3D landmarks whose GP-extrapolated dense depths drive the
photometric term, plus GP/pixel/log-depth/gauge priors.

How (TPU-native redesign):
  * the whole iterate is ONE jit: scaffold -> dense prediction -> pair
    linearization -> prior factors -> assembly -> Cholesky -> retract;
    no host round trips, static shapes, masked validity;
  * the reference's per-point Jacobian tensors (dPwn_dzm etc., hundreds
    of MB) are kept *factored*: the dense-point-to-anchor chain is a
    rank-1 outer product u_n (x) v_n, so all anchor-space Hessian blocks
    become (ND, M) matmuls on the MXU;
  * Hessian assembly goes through per-keyframe *anchor (z) space* first
    (dense block grids, no scatter), and is expanded to landmark space by
    the constant per-frame dz/dP row — the reference's "geometry
    sleight-of-hand" (photo.py:169-182) taken to its conclusion: the only
    scatters left are 9 block-grid adds with unique indices
    (deterministic, unlike the reference's scatter_add_);
  * robust MAD sigma uses a histogram median (ops/reduce.py) instead of a
    49k-element sort per iteration.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from como_tpu.geometry import lie
from como_tpu.odom.window import WindowDims, WindowState
from como_tpu.ops.interp import bilinear_sample_frames
from como_tpu.ops.reduce import fast_mad_sigma, histogram_median

from como_tpu.odom.backend.robust import huber as _huber_w

HIGH = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=HIGH)


class GNStats(NamedTuple):
    total_err: jax.Array
    photo_err: jax.Array
    delta_norm: jax.Array
    grad_norm: jax.Array


# ---------------------------------------------------------------------------
# scaffold: landmarks -> per-KF anchors

def _scaffold(state: WindowState, K_intr, dims: WindowDims,
              far_ratio: float = 50.0):
    K, M = dims.K, dims.M
    pose = state.kf_pose
    Twc_inv = lie.invert_se3(pose)                      # (K, 4, 4)
    Rcw = Twc_inv[:, :3, :3]
    tcw = Twc_inv[:, :3, 3]
    Adj = lie.adjoint(pose)                             # (K, 6, 6)

    Pw = state.P_lm[state.anchor_lm]                    # (K, M, 3)
    Pc = jnp.einsum("kij,kmj->kmi", Rcw, Pw, precision=HIGH) + tcw[:, None]

    # behind-camera reinit: per landmark, the first-obs anchor backprojected
    # at its KF's median depth (reference sparse_map.project_landmarks +
    # Mapping.prep_geometry_scaffold)
    fx, fy = K_intr[0, 0], K_intr[1, 1]
    cx, cy = K_intr[0, 2], K_intr[1, 2]
    med = state.median_depth[:, None]                   # (K, 1)
    rx = (state.pm_first[..., 0] - cx) / fx
    ry = (state.pm_first[..., 1] - cy) / fy
    init_Pc = jnp.stack([rx * med, ry * med, jnp.broadcast_to(med, rx.shape)], -1)
    init_Pw_km = jnp.einsum("kij,kmj->kmi", pose[:, :3, :3], init_Pc,
                            precision=HIGH) + pose[:, None, :3, 3]
    # accumulate per-landmark init values from first-obs anchors.  One-hot
    # selection matmul, not scatter-add: TPU serializes duplicate-index
    # scatters (measured ~1.5 ms of the 2 ms scaffold at full size).
    w_first = (state.obs_ref & state.kf_valid[:, None]).astype(Pw.dtype)
    sel_lm = jax.nn.one_hot(state.anchor_lm.reshape(-1), state.P_lm.shape[0],
                            dtype=Pw.dtype)                  # (K*M, L)
    init_lm = jnp.einsum("al,ac->lc", sel_lm,
                         (init_Pw_km * w_first[..., None]).reshape(-1, 3),
                         precision=HIGH)
    init_Pc_km = jnp.einsum("kij,kmj->kmi", Rcw, init_lm[state.anchor_lm],
                            precision=HIGH) + tcw[:, None]

    z = Pc[..., 2]
    # near guard from the reference (sparse_map.py:27-41: z < 0.1 median ->
    # reinit at median); the far guard is ours: on worlds with strong depth
    # discontinuities a silhouette landmark can run away to z >> scene scale
    # (photometric cost is flat there, GN keeps pushing), so reinit
    # symmetrically when it exceeds far_ratio x median.
    z_bad = (z < 0.1 * med) | (z > far_ratio * med)
    Pc = jnp.where(z_bad[..., None], init_Pc_km, Pc)
    z = jnp.maximum(Pc[..., 2], 1e-6)
    logzm = jnp.log(z)

    # pixel projection + Jacobians (xy)
    u_pix = fx * Pc[..., 0] / z + cx
    v_pix = fy * Pc[..., 1] / z + cy
    pm = jnp.stack([u_pix, v_pix], axis=-1)
    zero = jnp.zeros_like(z)
    dp_dPc = jnp.stack([
        jnp.stack([jnp.broadcast_to(fx, z.shape), zero, -(u_pix - cx)], -1),
        jnp.stack([zero, jnp.broadcast_to(fy, z.shape), -(v_pix - cy)], -1),
    ], -2) / z[..., None, None]                          # (K, M, 2, 3)

    # dPc/dTwc = [-Rcw skew(Pw), Rcw] @ (-Adj)
    dPc_dTcw = jnp.concatenate([
        -jnp.einsum("kij,kmjl->kmil", Rcw, lie.skew(Pw), precision=HIGH),
        jnp.broadcast_to(Rcw[:, None], Pw.shape[:2] + (3, 3)),
    ], axis=-1)                                          # (K, M, 3, 6)
    dPc_dTwc = jnp.einsum("kmij,kjl->kmil", dPc_dTcw, -Adj, precision=HIGH)

    dz_dTwc = dPc_dTwc[:, :, 2, :]                      # (K, M, 6)
    dz_dPw = Rcw[:, 2, :]                               # (K, 3) per-frame const
    dlogzm_dTwc = dz_dTwc / z[..., None]
    dp_dTwc = jnp.einsum("kmij,kmjl->kmil", dp_dPc, dPc_dTwc, precision=HIGH)
    dp_dPw = jnp.einsum("kmij,kjl->kmil", dp_dPc,
                        jnp.broadcast_to(Rcw, (K, 3, 3)), precision=HIGH)

    # landmark reinit (state update): reinit where behind first-obs camera
    reinit_lm_w = jnp.einsum(
        "al,a->l", sel_lm,
        (z_bad & state.obs_ref & state.kf_valid[:, None])
        .astype(Pw.dtype).reshape(-1), precision=HIGH)
    P_lm_new = jnp.where((reinit_lm_w > 0)[:, None], init_lm, state.P_lm)

    return dict(Pc=Pc, z=z, logzm=logzm, pm=pm, dz_dPw=dz_dPw, dz_dTwc=dz_dTwc,
                dlogzm_dTwc=dlogzm_dTwc, dp_dTwc=dp_dTwc, dp_dPw=dp_dPw,
                Rcw=Rcw, Adj=Adj, P_lm_new=P_lm_new)


# ---------------------------------------------------------------------------
# dense reference points from anchors (GP prediction)

def _dense_points(state: WindowState, sc, K_intr, dims: WindowDims):
    Wk = state.dense_knm                                # (K, ND, M)
    logzn = jnp.einsum("knm,km->kn", Wk, sc["logzm"], precision=HIGH)
    z_n = jnp.exp(logzn)
    fx, fy = K_intr[0, 0], K_intr[1, 1]
    cx, cy = K_intr[0, 2], K_intr[1, 2]
    rx = (state.dense_rc[..., 1] - cx) / fx
    ry = (state.dense_rc[..., 0] - cy) / fy
    ray = jnp.stack([rx, ry, jnp.ones_like(rx)], -1)    # (K, ND, 3)
    Pc_n = z_n[..., None] * ray
    R = state.kf_pose[:, :3, :3]
    t = state.kf_pose[:, :3, 3]
    u = jnp.einsum("kij,knj->kni", R, Pc_n, precision=HIGH)  # = Pw_n - t
    Pw_n = u + t[:, None]
    # GP chain factors
    q = jnp.einsum("knm,kmj->knj", Wk, sc["dlogzm_dTwc"], precision=HIGH)  # (K,ND,6)
    v = Wk / sc["z"][:, None, :]                         # (K, ND, M)
    # (the reference also computes a per-KF median of this dense depth for
    # its radius-based pair construction — disabled by default; we compute
    # medians on the dense sites only when actually needed)
    return dict(Pw_n=Pw_n, Pc_n=Pc_n, u=u, q=q, v=v, z_n=z_n, logzn=logzn)


# ---------------------------------------------------------------------------
# photometric pair linearization

def _photo(state, sc, dn, pairs_ref, pairs_tgt, pairs_valid, K_intr,
           dims: WindowDims, axis_name=None, occl_thresh: float = 0.0,
           estimate_affine: bool = True):
    """Pair linearization.  Channel-generalized (dims.C): gray mapping is
    C=1; RGB mapping (reference Mapping.py:71-73,370-372, mapping.color:
    rgb) is C=3 with per-channel residual rows sharing the per-site
    geometry chain — image tensors carry a leading channel axis (P, C,
    ND, ...), geometry tensors stay (P, ND, ...)."""
    K, O, M, ND, C = dims.K, dims.O, dims.M, dims.ND, dims.C
    F = K + O
    H_img, W_img = dims.H, dims.W
    fx, fy = K_intr[0, 0], K_intr[1, 1]
    cx, cy = K_intr[0, 2], K_intr[1, 2]

    pose_f = jnp.concatenate([state.kf_pose, state.ow_pose], 0)   # (F,4,4)
    aff_f = jnp.concatenate([state.kf_aff, state.ow_aff], 0)
    img_f = jnp.concatenate([state.kf_img, state.ow_img], 0)      # (F,3C,H,W)
    valid_f = jnp.concatenate([state.kf_valid, state.ow_valid], 0)

    i = pairs_ref                                       # (P,)
    j = pairs_tgt
    P = i.shape[0]

    vals_i = state.dense_vals[i]                        # (P, C, ND)
    Pw_n = dn["Pw_n"][i]
    Pc_i = dn["Pc_n"][i]
    u_i = dn["u"][i]
    q_i = dn["q"][i]
    v_i = dn["v"][i]                                    # (P, ND, M)
    R_i = state.kf_pose[i, :3, :3]
    aff_i = state.kf_aff[i]

    pose_j = pose_f[j]
    aff_j = aff_f[j]
    Tcw_j = lie.invert_se3(pose_j)
    Rcw_j = Tcw_j[:, :3, :3]
    tcw_j = Tcw_j[:, :3, 3]
    Adj_j = lie.adjoint(pose_j)

    Pcj = jnp.einsum("pij,pnj->pni", Rcw_j, Pw_n, precision=HIGH) + tcw_j[:, None]
    zj = Pcj[..., 2]
    zj_safe = jnp.where(zj > 1e-6, zj, 1.0)
    px = fx * Pcj[..., 0] / zj_safe + cx
    py = fy * Pcj[..., 1] / zj_safe + cy

    samp = bilinear_sample_frames(img_f, j, jnp.stack([px, py], -1))  # (P,3C,ND)
    I_t, gx, gy = samp[:, :C], samp[:, C: 2 * C], samp[:, 2 * C:]     # (P,C,ND)

    valid = ((px >= 1) & (px < W_img - 1) & (py >= 1) & (py < H_img - 1)
             & (zj > 0)
             & pairs_valid[:, None] & state.kf_valid[i][:, None]
             & valid_f[j][:, None])

    if occl_thresh > 0.0:
        # occlusion gate (ours; the reference's projective association,
        # photo.py:105-111, samples the target image blindly): a warped
        # point lying more than occl_thresh (log-depth) BEHIND the target
        # keyframe's own GP surface is occluded there — its residual would
        # compare the ref surface against whatever nearer surface covers
        # that pixel.  Only KF targets carry a depth model; one-way frames
        # are left ungated.  Nearest-neighbor lookup of the exact
        # full-image GP surface: a coarser dense-site lookup was measured
        # ~2 ms cheaper but lets the gate set flicker across iterations
        # near silhouettes (intra-window depth variation), visibly
        # weakening the GN fixed point — exactness wins here.
        logz_tgt = jnp.einsum("khm,km->kh", state.Knm_full, sc["logzm"],
                              precision=HIGH)               # (K, H*W)
        px_i = jnp.clip(jnp.round(px).astype(jnp.int32), 0, W_img - 1)
        py_i = jnp.clip(jnp.round(py).astype(jnp.int32), 0, H_img - 1)
        jk = jnp.minimum(j, K - 1)
        lz_s = logz_tgt[jk[:, None], py_i * W_img + px_i]   # (P, ND)
        is_kf_tgt = (j < K)[:, None]
        occluded = is_kf_tgt & (jnp.log(zj_safe) > lz_s + occl_thresh)
        valid = valid & ~occluded

    ea = jnp.exp(aff_j[:, 0] - aff_i[:, 0])[:, None, None]
    vals_scaled = ea * vals_i                            # (P, C, ND)
    r = I_t - vals_scaled + (aff_j[:, 1] - aff_i[:, 1])[:, None, None]

    valid_c = valid[:, None, :]                          # (P, 1, ND)
    sigma = fast_mad_sigma(r.reshape(P, C * ND),
                           jnp.broadcast_to(valid_c, r.shape).reshape(P, C * ND),
                           axis_name=axis_name) + 1e-12
    # 1/C: per-site channel AVERAGE, not sum.  The C channels of one dense
    # site observe the same surface point (highly correlated residuals);
    # counting them as C independent measurements would triple the
    # photometric term's weight against the prior factors whose sigmas are
    # tuned for gray, measurably hurting ATE on chromatic data (2-4x on
    # the clutter_chroma/_photo worlds).  Averaging keeps the photometric
    # <-> prior balance invariant to mapping.color while still letting
    # every channel's gradient structure enter H.  No-op for C=1.
    w = _huber_w(r / sigma) * valid_c / (sigma * sigma * C)  # (P, C, ND)
    photo_err = jnp.sum(w * r * r)

    # image gradient chain: dIt/dPcj = [gx, gy] @ dp/dPcj with
    # dp/dPc = (1/z) [[fx, 0, -(px-cx)], [0, fy, -(py-cy)]]
    zc = zj_safe[:, None, :]
    a_img = jnp.stack([gx * fx, gy * fy], -1) / zc[..., None]  # (P,C,ND,2)
    pxc = px[:, None, :]
    pyc = py[:, None, :]
    dIt_dPcj = jnp.stack([
        a_img[..., 0],
        a_img[..., 1],
        -(a_img[..., 0] * (pxc - cx) / fx + a_img[..., 1] * (pyc - cy) / fy),
    ], -1)                                               # (P, C, ND, 3)

    dIt_dPwn = jnp.einsum("pcna,pai->pcni", dIt_dPcj, Rcw_j, precision=HIGH)
    s = jnp.einsum("pcni,pni->pcn", dIt_dPwn, u_i)      # anchor-chain scalar

    # ref-pose Jacobian: direct + GP term
    aR = jnp.einsum("pcni,pij->pcnj", dIt_dPwn, R_i, precision=HIGH)
    rot_i = jnp.cross(Pc_i[:, None], aR)
    J_ti = (jnp.concatenate([rot_i, aR], -1)
            + s[..., None] * q_i[:, None])               # (P, C, ND, 6)

    # target-pose Jacobian: [cross(Pwn, dIt_dPwn), dIt_dPwn] @ (-Adj_j)
    pre = jnp.concatenate([jnp.cross(Pw_n[:, None], dIt_dPwn), dIt_dPwn], -1)
    J_tj = -jnp.einsum("pcnj,pjl->pcnl", pre, Adj_j, precision=HIGH)

    one = jnp.ones_like(vals_scaled)
    if not estimate_affine:
        # affine ablation (config mapping.estimate_affine): zero affine
        # columns -> the global solve's affine entries see only the
        # diagonal damping, so every frame's affine delta is exactly zero
        # and the states stay pinned at their initial zeros
        vals_scaled_col, one_col = jnp.zeros_like(one), jnp.zeros_like(one)
    else:
        vals_scaled_col, one_col = vals_scaled, one
    J8_i = jnp.concatenate([J_ti, vals_scaled_col[..., None],
                            -one_col[..., None]], -1)
    J8_j = jnp.concatenate([J_tj, -vals_scaled_col[..., None],
                            one_col[..., None]], -1)

    # --- accumulate block grids --------------------------------------------
    Jw_i = J8_i * w[..., None]
    H_ii = jnp.einsum("pcnk,pcnl->pkl", Jw_i, J8_i, precision=HIGH)
    H_jj = jnp.einsum("pcnk,pcnl->pkl", J8_j * w[..., None], J8_j,
                      precision=HIGH)
    H_ij = jnp.einsum("pcnk,pcnl->pkl", Jw_i, J8_j, precision=HIGH)
    g_i = -jnp.einsum("pcnk,pcn->pk", J8_i, w * r, precision=HIGH)
    g_j = -jnp.einsum("pcnk,pcn->pk", J8_j, w * r, precision=HIGH)

    ws = w * s                                           # (P, C, ND)
    # channel sums first: the anchor chain v_i is per-site, so channel
    # contributions fold into per-site weights before the (ND, M) matmuls
    wss_n = jnp.sum(ws * s, axis=1)                      # (P, ND)
    wsr_n = jnp.sum(ws * r, axis=1)
    Hzm_p = jnp.einsum("pnm,pn,pnl->pml", v_i, wss_n, v_i, precision=HIGH)
    Hi_zm = jnp.einsum("pcnk,pcn,pnm->pkm", J8_i, ws, v_i, precision=HIGH)
    Hj_zm = jnp.einsum("pcnk,pcn,pnm->pkm", J8_j, ws, v_i, precision=HIGH)
    g_zm_p = -jnp.einsum("pn,pnm->pm", wsr_n, v_i, precision=HIGH)

    # scatter into grids (indices unique per add-call via sequential .add)
    HPP = jnp.zeros((F, F, 8, 8), r.dtype)
    HPP = HPP.at[i, i].add(H_ii)
    HPP = HPP.at[j, j].add(H_jj)
    HPP = HPP.at[i, j].add(H_ij)
    HPP = HPP.at[j, i].add(jnp.swapaxes(H_ij, -1, -2))
    gP = jnp.zeros((F, 8), r.dtype).at[i].add(g_i).at[j].add(g_j)

    Hzm = jnp.zeros((K, M, M), r.dtype).at[i].add(Hzm_p)
    HPzm = jnp.zeros((F, K, 8, M), r.dtype)
    HPzm = HPzm.at[i, i].add(Hi_zm)
    HPzm = HPzm.at[j, i].add(Hj_zm)
    gzm = jnp.zeros((K, M), r.dtype).at[i].add(g_zm_p)

    return HPP, gP, Hzm, HPzm, gzm, photo_err


# ---------------------------------------------------------------------------
# the full step

def _gn_step_impl(state: WindowState, pairs_ref, pairs_tgt, pairs_valid,
                  K_intr, dims: WindowDims, sigmas, damping=1e-6):
    """One GN iteration.  sigmas: hashable namedtuple (see SigmaStatic)."""
    sc = _scaffold(state, K_intr, dims, sigmas.far_depth_ratio)
    state = state._replace(P_lm=sc["P_lm_new"])
    # re-evaluating anchors against reinitialized landmarks is implicit: the
    # scaffold already substituted reinit values for the bad entries.
    dn = _dense_points(state, sc, K_intr, dims)
    photo = _photo(state, sc, dn, pairs_ref, pairs_tgt, pairs_valid,
                   K_intr, dims, occl_thresh=sigmas.occlusion_thresh,
                   estimate_affine=sigmas.estimate_affine)
    return _finish(state, sc, dn, photo, K_intr, dims, sigmas, damping)


gn_step = partial(jax.jit, static_argnames=("dims", "sigmas"))(
    _gn_step_impl)
# Owner-loop variant: donates the state buffers so unchanged fields alias
# through instead of being copied every iteration (~160 MB at full size).
# Callers must not reuse the input state afterwards (Mapping.iterate).
gn_step_donating = partial(
    jax.jit, static_argnames=("dims", "sigmas"),
    donate_argnums=(0,))(_gn_step_impl)


def _assemble(state: WindowState, sc, dn, photo, K_intr, dims: WindowDims,
              sigmas):
    """Prior factors + global (H, g) assembly (replicated part of the
    multi-chip step; see parallel/sharded.py).  _finish adds masking,
    damping, the Cholesky solve, and the retraction."""
    K, O, M, L = dims.K, dims.O, dims.M, dims.L
    F = K + O
    D = dims.D
    dtype = state.P_lm.dtype
    HPP, gP, Hzm, HPzm, gzm, photo_err = photo

    kfv = state.kf_valid.astype(dtype)                   # (K,)
    z = sc["z"]
    inv_z = 1.0 / z
    A = sc["dlogzm_dTwc"]                                # (K, M, 6)
    log_med = jnp.log(jnp.maximum(state.median_depth, 1e-6))[:, None]
    total_err = photo_err

    # ---- GP marginal-likelihood prior (reference gp_priors.gp_ml_cost,
    # sigma hard-coded 1e0 at Mapping.py:821) --------------------------------
    info = kfv / (sigmas.gp_prior ** 2)                  # masked info (K,)
    y = sc["logzm"] - log_med                            # (K, M)
    Kinv = state.Kmm_inv
    Kinv_y = jnp.einsum("kmn,kn->km", Kinv, y, precision=HIGH)
    Dz = inv_z                                           # diag(1/zm)
    Hzm = Hzm + info[:, None, None] * (Dz[:, :, None] * Kinv * Dz[:, None, :])
    KinvA = jnp.einsum("kmn,knj->kmj", Kinv, A, precision=HIGH)
    H_pose_gp = info[:, None, None] * jnp.einsum("kmi,kmj->kij", A, KinvA,
                                                 precision=HIGH)
    # cross term: A^T K^-1 diag(1/z): (K, 6, M)
    H_pose_zm_gp = info[:, None, None] * (
        jnp.einsum("kmi,kmn->kin", A, Kinv, precision=HIGH) * Dz[:, None, :])
    g_pose_gp = -info[:, None] * jnp.einsum("kmi,km->ki", A, Kinv_y, precision=HIGH)
    g_zm_gp = -info[:, None] * (Dz * Kinv_y)
    total_err += jnp.sum(info * jnp.einsum("km,km->k", y, Kinv_y))

    # ---- log-depth prior, gated modes (factors/depth_prior.py; default
    # "first_mean" with sigma_first=1e0, Mapping.py:836) ---------------------
    wH_ld, wr_ld = _prior_mode_weights(
        sigmas.log_depth_mode, state.obs_ref,
        1.0 / (sigmas.log_depth_first ** 2), 1.0 / (sigmas.log_depth_all ** 2))
    wH_ld = wH_ld * kfv[:, None]
    wr_ld = wr_ld * kfv[:, None]
    r_ld = y                                             # logzm - log_med
    Hzm = Hzm + jnp.zeros_like(Hzm).at[
        :, jnp.arange(M), jnp.arange(M)].add(wH_ld * inv_z * inv_z)
    H_pose_ld = jnp.einsum("km,kmi,kmj->kij", wH_ld, A, A, precision=HIGH)
    H_pose_zm_ld = jnp.einsum("km,kmi->kim", wH_ld * inv_z, A, precision=HIGH)
    g_pose_ld = -jnp.einsum("km,kmi->ki", wr_ld * r_ld, A, precision=HIGH)
    g_zm_ld = -wr_ld * inv_z * r_ld
    total_err += jnp.sum(wr_ld * r_ld * r_ld)

    # ---- scale prior: mean predicted log depth of the oldest KF pinned to
    # the SfM anchor until the window fills (factors/gp_priors.
    # mean_log_depth_cost; Mapping.py:902-917) -------------------------------
    not_full = jnp.logical_not(state.window_full).astype(dtype)
    info_s = not_full * kfv[0] / (sigmas.mean_depth_prior ** 2)
    c0 = state.knm_colmean[0]                            # (M,)
    r_s = jnp.dot(c0, sc["logzm"][0]) - state.scale_anchor
    dr_dzm0 = c0 * inv_z[0]                              # (M,)
    dr_dT0 = jnp.einsum("m,mi->i", c0, A[0], precision=HIGH)  # (6,)
    Hzm = Hzm.at[0].add(info_s * jnp.outer(dr_dzm0, dr_dzm0))
    H_pose_s0 = info_s * jnp.outer(dr_dT0, dr_dT0)
    H_pose_zm_s0 = info_s * jnp.outer(dr_dT0, dr_dzm0)   # (6, M)
    g_pose_s0 = -info_s * dr_dT0 * r_s
    g_zm_s0 = -info_s * dr_dzm0 * r_s
    total_err += info_s * r_s * r_s

    # ---- pixel prior, gated modes (factors/pixel_prior.py; default
    # "first" with sigmas 1e-2 / 3.33e-1 at Mapping.py:851-852):
    # landmark-space 3x3 anchor blocks ---------------------------------------
    wH_px, wr_px = _prior_mode_weights(
        sigmas.pixel_mode, state.obs_ref,
        1.0 / (sigmas.pixel_first ** 2), 1.0 / (sigmas.pixel_all ** 2))
    wH_px = wH_px * kfv[:, None]
    wr_px = wr_px * kfv[:, None]
    r_pix = sc["pm"] - state.pm_first                    # (K, M, 2)
    dp_dPw = sc["dp_dPw"]
    dp_dTwc = sc["dp_dTwc"]
    H_anchor_pix = jnp.einsum("km,kmci,kmcj->kmij", wH_px, dp_dPw, dp_dPw,
                              precision=HIGH)            # (K, M, 3, 3)
    H_pose_pix = jnp.einsum("km,kmci,kmcj->kij", wH_px, dp_dTwc, dp_dTwc,
                            precision=HIGH)
    H_pose_anchor_pix = jnp.einsum("km,kmci,kmcj->kmij", wH_px, dp_dTwc,
                                   dp_dPw, precision=HIGH)  # (K, M, 6, 3)
    g_anchor_pix = -jnp.einsum("km,kmci,kmc->kmi", wr_px, dp_dPw, r_pix,
                               precision=HIGH)           # (K, M, 3)
    g_pose_pix = -jnp.einsum("km,kmci,kmc->ki", wr_px, dp_dTwc, r_pix,
                             precision=HIGH)
    total_err += jnp.sum(wr_px * jnp.sum(r_pix * r_pix, -1))

    # ---- fold pose-side prior terms into grids -----------------------------
    pose_extra = H_pose_gp + H_pose_ld + H_pose_pix
    pose_extra = pose_extra.at[0].add(H_pose_s0)
    kf_diag = jnp.arange(K)
    HPP = HPP.at[kf_diag, kf_diag, :6, :6].add(pose_extra)
    gP = gP.at[:K, :6].add(g_pose_gp + g_pose_ld + g_pose_pix)
    gP = gP.at[0, :6].add(g_pose_s0)

    H_pose_zm = H_pose_zm_gp + H_pose_zm_ld              # (K, 6, M)
    H_pose_zm = H_pose_zm.at[0].add(H_pose_zm_s0)
    HPzm = HPzm.at[kf_diag, kf_diag, :6, :].add(H_pose_zm)
    gzm = gzm + g_zm_gp + g_zm_ld
    gzm = gzm.at[0].add(g_zm_s0)

    # ---- gauge priors: oldest KF pose + affine (pose_prior_factors /
    # scalar_prior_factors; sigmas from config) ------------------------------
    info_pp = kfv[0] / (sigmas.pose_prior ** 2)
    xi_pp = lie.se3_log((lie.invert_se3(state.kf_pose[0]) @ state.pose_anchor)[None])[0]
    HPP = HPP.at[0, 0, :6, :6].add(info_pp * jnp.eye(6, dtype=dtype))
    gP = gP.at[0, :6].add(info_pp * xi_pp)
    info_sc = kfv[0] / (sigmas.scale_prior ** 2)
    r_aff = state.kf_aff[0] - state.aff_anchor
    HPP = HPP.at[0, 0, jnp.arange(6, 8), jnp.arange(6, 8)].add(info_sc)
    gP = gP.at[0, 6:8].add(-info_sc * r_aff)
    total_err += info_pp * jnp.sum(xi_pp ** 2) + info_sc * jnp.sum(r_aff ** 2)

    # ---- assemble the global system ----------------------------------------
    # Scatter-free: TPU serializes duplicate-index scatter-adds into a
    # (D, D) buffer (measured ~11 ms for the three block scatters at full
    # size).  Instead, expand each KF's anchor blocks into global landmark
    # space with one-hot selection matmuls (~1 GFLOP, MXU-friendly) and
    # build H by block concatenation.
    e = sc["dz_dPw"]                                     # (K, 3)

    # expand anchor z-space Hessians to landmark space, per KF
    HLL = jnp.einsum("kab,ki,kj->kaibj", Hzm, e, e,
                     precision=HIGH).reshape(K, 3 * M, 3 * M)
    # per-anchor 3x3 pixel blocks onto the block diagonal of HLL
    a_idx = (3 * jnp.arange(M)[:, None, None] + jnp.arange(3)[None, :, None])
    b_idx = (3 * jnp.arange(M)[:, None, None] + jnp.arange(3)[None, None, :])
    HLL = HLL.at[:, a_idx, b_idx].add(H_anchor_pix)

    HPL = jnp.einsum("fkpm,ki->fkpmi", HPzm, e,
                     precision=HIGH).reshape(F, K, 8, 3 * M)
    # pixel-prior pose-anchor cross terms: at (pose k, ref k)
    HPL = HPL.at[kf_diag, kf_diag, :6, :].add(
        jnp.transpose(H_pose_anchor_pix, (0, 2, 1, 3)).reshape(K, 6, 3 * M))

    gL = gzm[:, :, None] * e[:, None, :]                 # (K, M, 3)
    gL = (gL + g_anchor_pix).reshape(K, 3 * M)

    # selection one-hots: sel[k, a, j] = 1 iff anchor column a of KF k is
    # global landmark column j (duplicates across KFs sum via the matmul)
    lm_idx = (3 * state.anchor_lm[..., None]
              + jnp.arange(3)[None, None, :]).reshape(K, 3 * M)
    sel = jax.nn.one_hot(lm_idx, 3 * L, dtype=dtype)     # (K, 3M, 3L)

    HLL_g = jnp.einsum("kaj,kaJ->jJ",
                       jnp.einsum("kab,kbJ->kaJ", HLL, sel, precision=HIGH),
                       sel, precision=HIGH)              # (3L, 3L)
    HPL_flat = jnp.transpose(HPL, (0, 2, 1, 3)).reshape(8 * F, K, 3 * M)
    G = jnp.einsum("rka,kaJ->rJ", HPL_flat, sel, precision=HIGH)  # (8F, 3L)
    gl_g = jnp.einsum("ka,kaJ->J", gL, sel, precision=HIGH)       # (3L,)

    # ---- frozen-landmark prior (marginalization surrogate; Mapping.py:886)
    info_fz = state.window_full.astype(dtype) / (sigmas.scale_prior ** 2)
    fz_mask = state.P_anchor_mask.astype(dtype) * info_fz          # (L,)
    r_fz = (state.P_lm - state.P_anchor_vals)
    fz3 = jnp.repeat(fz_mask, 3)
    HLL_g = HLL_g + jnp.diag(fz3)
    gl_g = gl_g + (-fz_mask[:, None] * r_fz).reshape(-1)
    total_err += jnp.sum(fz_mask[:, None] * r_fz * r_fz)

    HPP_flat = jnp.transpose(HPP, (0, 2, 1, 3)).reshape(8 * F, 8 * F)
    Hbig = jnp.concatenate([
        jnp.concatenate([HPP_flat, G], axis=1),
        jnp.concatenate([G.T, HLL_g], axis=1)], axis=0)
    gbig = jnp.concatenate([gP.reshape(-1), gl_g])
    return Hbig, gbig, total_err


@partial(jax.jit, static_argnames=("dims", "sigmas"))
def gn_system(state: WindowState, pairs_ref, pairs_tgt, pairs_valid, K_intr,
              dims: WindowDims, sigmas):
    """Assembled (H, g) of one linearization — for tests/diagnostics
    (g must equal the negative gradient of the frozen-sigma robust cost)."""
    sc = _scaffold(state, K_intr, dims, sigmas.far_depth_ratio)
    state = state._replace(P_lm=sc["P_lm_new"])
    dn = _dense_points(state, sc, K_intr, dims)
    photo = _photo(state, sc, dn, pairs_ref, pairs_tgt, pairs_valid,
                   K_intr, dims, occl_thresh=sigmas.occlusion_thresh,
                   estimate_affine=sigmas.estimate_affine)
    return _assemble(state, sc, dn, photo, K_intr, dims, sigmas)


def _finish(state: WindowState, sc, dn, photo, K_intr, dims: WindowDims,
            sigmas, damping):
    K, O, M, L = dims.K, dims.O, dims.M, dims.L
    F = K + O
    D = dims.D
    dtype = state.P_lm.dtype
    _, _, _, _, _, photo_err = photo
    Hbig, gbig, total_err = _assemble(state, sc, dn, photo, K_intr, dims,
                                      sigmas)

    # ---- validity masking + damping + solve --------------------------------
    pose_dim_valid = jnp.repeat(
        jnp.concatenate([state.kf_valid, state.ow_valid]), 8)
    lm_dim_valid = jnp.repeat(state.lm_valid, 3)
    dim_valid = jnp.concatenate([pose_dim_valid, lm_dim_valid]).astype(dtype)
    Hbig = Hbig * dim_valid[:, None] * dim_valid[None, :]
    Hbig = Hbig + jnp.diag(1.0 - dim_valid)
    gbig = gbig * dim_valid

    # Jacobi (diagonal) scaling: H and g mix curvatures spanning ~8 orders
    # of magnitude (photometric pose blocks vs 1e-4-sigma gauge priors vs
    # landmark z-chain blocks), which at f32 costs the Cholesky most of
    # its effective mantissa.  Solving the symmetrically scaled system
    # (S H S)(S^-1 delta) = S g with S = diag(H)^-1/2 brings the diagonal
    # to 1, making `damping` a RELATIVE floor (the reference's absolute
    # 1e-6 on a dense f64 system, linear_system.py:101-112, carried ~16
    # digits; f32 needs the scaling instead of precision).
    dH = jnp.diagonal(Hbig)
    s = jax.lax.rsqrt(jnp.maximum(dH, jnp.asarray(1e-20, dtype)))
    Hs = Hbig * s[:, None] * s[None, :]
    Hs = Hs + damping * jnp.eye(D, dtype=dtype)
    gs_ = s * gbig

    Lc = jnp.linalg.cholesky(Hs)
    yv = jax.scipy.linalg.solve_triangular(Lc, gs_[:, None], lower=True)
    delta = jax.scipy.linalg.solve_triangular(Lc.T, yv, lower=False)[:, 0]
    delta = s * delta
    delta = jnp.where(jnp.isfinite(delta), delta, 0.0)

    # ---- retract ------------------------------------------------------------
    d_kf = delta[: 8 * K].reshape(K, 8)
    d_ow = delta[8 * K: 8 * F].reshape(O, 8)
    d_lm = delta[8 * F:].reshape(L, 3)
    # trust region on landmark moves: cap each landmark's step at
    # lm_step_frac x scene scale (mean of per-KF median depths).  GN runs
    # every frame, so a genuinely far move still completes in a few
    # iterations; what this prevents is the single-iteration overshoot
    # that seeds the silhouette-landmark runaway on discontinuous worlds.
    kfw = state.kf_valid.astype(dtype)
    scene_scale = jnp.sum(state.median_depth * kfw) / jnp.maximum(
        jnp.sum(kfw), 1.0)
    cap = sigmas.lm_step_frac * scene_scale
    d_norm = jnp.linalg.norm(d_lm, axis=-1, keepdims=True)
    d_lm = d_lm * jnp.minimum(1.0, cap / jnp.maximum(d_norm, 1e-12))
    kf_pose = state.kf_pose @ lie.se3_exp(d_kf[:, :6])
    ow_pose = state.ow_pose @ lie.se3_exp(d_ow[:, :6])
    state = state._replace(
        kf_pose=jnp.where(state.kf_valid[:, None, None], kf_pose, state.kf_pose),
        kf_aff=state.kf_aff + d_kf[:, 6:] * state.kf_valid[:, None],
        ow_pose=jnp.where(state.ow_valid[:, None, None], ow_pose, state.ow_pose),
        ow_aff=state.ow_aff + d_ow[:, 6:] * state.ow_valid[:, None],
        P_lm=state.P_lm + d_lm * state.lm_valid[:, None],
        logzm=sc["logzm"], pm=sc["pm"],
    )

    # refresh median depths from the *dense-site* GP prediction (the
    # reference recomputes a full-image median every iterate; the
    # max-gradient dense sites track it closely at ~1/16 the cost and the
    # median only gates the behind-camera reinit threshold + weak priors)
    med_new = jax.vmap(lambda d, m: histogram_median(d, m))(
        dn["z_n"], jnp.broadcast_to(state.kf_valid[:, None], dn["z_n"].shape))
    state = state._replace(median_depth=jnp.where(state.kf_valid, med_new,
                                                  state.median_depth))

    stats = GNStats(total_err=total_err, photo_err=photo_err,
                    delta_norm=jnp.linalg.norm(delta),
                    grad_norm=jnp.linalg.norm(gbig))
    return state, stats


class SigmaStatic(NamedTuple):
    """Hashable sigma/mode set for gn_step (values from config.SigmasConfig).

    The *_mode fields select the reference's prior gating modes
    (factors/depth_prior.py:7-141, factors/pixel_prior.py:6-130):
    {first|all|first_plus_rest} x {mean|curr}; "curr" variants contribute
    curvature only (residual/gradient zeroed).  There is no photometric
    sigma: like the reference (photo.py:124-128), the photometric term is
    whitened by the per-iteration MAD estimate."""
    mean_depth_prior: float = 1e-2
    scale_prior: float = 1e-4
    pose_prior: float = 1e-6
    gp_prior: float = 1e0
    log_depth_first: float = 1e0
    log_depth_all: float = 1e0
    pixel_first: float = 1e-2
    pixel_all: float = 3.33e-1
    log_depth_mode: str = "first_mean"
    pixel_mode: str = "first"
    # robustness guards (no reference equivalent; see _scaffold/_finish)
    far_depth_ratio: float = 50.0
    lm_step_frac: float = 0.25
    # occlusion-aware photometric association (_photo; 0 disables)
    occlusion_thresh: float = 0.1
    # affine ablation switch (config mapping.estimate_affine)
    estimate_affine: bool = True


def _prior_mode_weights(mode: str, first_mask, info_first: float,
                        info_all: float):
    """(w_H, w_r) per-anchor weight fields for the gated prior modes."""
    import jax.numpy as jnp
    first = first_mask.astype(jnp.float32)
    rest = 1.0 - first
    if mode in ("first", "first_mean"):
        w_H = info_first * first
        w_r = w_H
    elif mode == "first_curr":
        w_H = info_first * first
        w_r = jnp.zeros_like(first)
    elif mode == "all_curr":
        w_H = info_all * jnp.ones_like(first)
        w_r = jnp.zeros_like(first)
    elif mode == "all_mean":
        w_H = info_all * jnp.ones_like(first)
        w_r = w_H
    elif mode == "first_plus_rest_mean":
        w_H = info_first * first + info_all * rest
        w_r = w_H
    elif mode == "first_plus_rest_curr":
        w_H = info_first * first + info_all * rest
        w_r = info_first * first
    else:
        raise ValueError(f"unknown prior mode '{mode}'")
    return w_H, w_r
