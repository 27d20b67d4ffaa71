"""Optional factors completing reference parity: pose-pose range factor
and dense log-depth prior.

Both are dead code in the reference (factors/range_factor.py and
factors/depth_prior.py:145-210 — never imported by any runtime path);
they are provided here as tested library factors so a user porting a
reference-derived experiment finds them.  Conventions match gn_step:
right-multiplied body-frame se(3) tangent [omega, v] (pose retraction
T <- T @ exp(delta)), factored GP chain (logzn = W @ logzm,
dlogzn/dTwc = q).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from como_tpu.geometry import lie

HIGH = jax.lax.Precision.HIGHEST


def pose_range_factor(range_meas, pose1, pose2, sigma):
    """Range measurement between camera centers (reference
    range_factor.pose_point_range/pose_range_factor).

    pose1, pose2: (B, 4, 4) world poses.  Returns (r_wh (B,),
    J1 (B, 6), J2 (B, 6), err) — whitened residual and its Jacobians wrt
    the right tangents of pose1 / pose2; the caller scatters
    J^T J / J^T r into its system.
    """
    info_sqrt = 1.0 / sigma
    T1_inv = lie.invert_se3(pose1)
    t2 = pose2[:, :3, 3]
    # t12: pose2's center in pose1's body frame
    t12 = jnp.einsum("bij,bj->bi", T1_inv[:, :3, :3], t2,
                     precision=HIGH) + T1_inv[:, :3, 3]
    rng = jnp.linalg.norm(t12, axis=-1)
    r = -(range_meas - rng)

    dr_dt12 = t12 / jnp.maximum(rng, 1e-12)[:, None]       # (B, 3)
    # right-tangent of pose1: d t12 = [t12]_x omega1 - v1
    dt12_dT1 = jnp.concatenate([lie.skew(t12), -jnp.broadcast_to(
        jnp.eye(3, dtype=pose1.dtype), t12.shape[:1] + (3, 3))], axis=-1)
    # right-tangent of pose2: d t2_w = R2 (v2 - [t2_b]_x omega2) with
    # t2_b = 0 at the center => d t12 = R1^-1 R2 v2
    R12 = jnp.einsum("bij,bjk->bik", T1_inv[:, :3, :3], pose2[:, :3, :3],
                     precision=HIGH)
    J1 = info_sqrt * jnp.einsum("bi,bij->bj", dr_dt12, dt12_dT1,
                                precision=HIGH)            # (B, 6)
    J2_v = info_sqrt * jnp.einsum("bi,bij->bj", dr_dt12, R12, precision=HIGH)
    J2 = jnp.concatenate([jnp.zeros_like(J2_v), J2_v], axis=-1)
    r_wh = info_sqrt * r
    return r_wh, J1, J2, jnp.sum(r_wh ** 2)


def dense_depth_prior(logzn, logz_mean, W_nm, q_n, inv_zm, dz_dPw, sigma):
    """Dense log-depth prior (reference depth_prior.dense_depth_prior):
    pins the GP-predicted dense log-depths of one keyframe to a target.

    logzn (N,) predicted dense log-depths; logz_mean target (scalar or
    (N,)); W_nm (N, M) GP prediction weights; q_n (N, 6) dlogzn/dTwc;
    inv_zm (M,) 1/z at anchors; dz_dPw (3,) the per-frame constant
    dz/dP row.  Returns anchor-space contributions in gn_step's factored
    layout: dict(H_zm (M, M), H_pose (6, 6), H_pose_zm (6, M),
    H_lm expansion is the caller's e-row job), g_zm (M,), g_pose (6,),
    err.
    """
    info = 1.0 / (sigma ** 2)
    r = logzn - logz_mean                                   # (N,)
    # dr/dlogzm = W_nm; dlogzm/d(anchor z) = diag(1/zm)
    A = W_nm * inv_zm[None, :]                              # (N, M) dr/dzm
    H_zm = info * jnp.einsum("nm,nl->ml", A, A, precision=HIGH)
    H_pose = info * jnp.einsum("ni,nj->ij", q_n, q_n, precision=HIGH)
    H_pose_zm = info * jnp.einsum("ni,nm->im", q_n, A, precision=HIGH)
    g_zm = -info * jnp.einsum("nm,n->m", A, r, precision=HIGH)
    g_pose = -info * jnp.einsum("ni,n->i", q_n, r, precision=HIGH)
    err = info * jnp.sum(r ** 2)
    return dict(H_zm=H_zm, H_pose=H_pose, H_pose_zm=H_pose_zm,
                g_zm=g_zm, g_pose=g_pose, err=err, dz_dPw=dz_dPw)
