"""Rigid transforms of point sets with Jacobians (reference como/geometry/transforms.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from como_tpu.geometry.lie import invert_se3, skew


def get_T_w_curr(T_w_ref: jax.Array, T_curr_ref: jax.Array) -> jax.Array:
    return T_w_ref @ invert_se3(T_curr_ref)


def get_rel_pose(pose1: jax.Array, pose2: jax.Array) -> jax.Array:
    return invert_se3(pose1) @ pose2


def transform_points(Tji: jax.Array, Pi: jax.Array):
    """Apply (B, 4, 4) transforms to (B|1, N, 3) points.

    Returns Pj (B, N, 3), dPj_dT (B, N, 3, 6) in [omega, v] tangent order
    (dPj/dxi = [-R P^, R]), and dPj_dPi = R (B, 1, 3, 3), which is shared
    by all points of a frame (exploited downstream, as in the reference).
    """
    R = Tji[:, None, :3, :3]
    t = Tji[:, None, :3, 3]
    Pj = jnp.squeeze(R @ Pi[..., None], -1) + t
    dPj_dT = jnp.concatenate([-(R @ skew(Pi)), jnp.broadcast_to(R, Pi.shape[:-1] + (3, 3))], axis=-1)
    return Pj, dPj_dT, R
