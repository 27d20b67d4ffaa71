"""SE(3)/SO(3) Lie group operations in pure JAX.

Closed-form exponential/log maps replace the reference's external
`lietorch` CUDA extension (reference: como/geometry/lie_algebra.py).
Tangent vector convention everywhere: xi = [omega (3), v (3)], i.e.
rotation first, matching the reference's Jacobian layout
(dP/dxi = [-P^, I]).  All ops are batched over leading dims and safe at
theta -> 0 via Taylor expansions (important: jitted, no branching).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


def skew(p: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix. p^ @ x = p x x."""
    z = jnp.zeros_like(p[..., 0])
    rows = [
        jnp.stack([z, -p[..., 2], p[..., 1]], axis=-1),
        jnp.stack([p[..., 2], z, -p[..., 0]], axis=-1),
        jnp.stack([-p[..., 1], p[..., 0], z], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def _sinc_coeffs(theta2: jax.Array):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3).

    Stable at t=0 via 4th-order Taylor (switch at small theta2).
    """
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta + _EPS))
    return A, B, C


def so3_exp(omega: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) Rodrigues formula."""
    theta2 = jnp.sum(jnp.square(omega), axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    W = skew(omega)
    WW = W @ W
    I = jnp.eye(3, dtype=omega.dtype)
    return I + A[..., None, None] * W + B[..., None, None] * WW


def se3_exp(xi: jax.Array) -> jax.Array:
    """(..., 6) tangent [omega, v] -> (..., 4, 4) SE(3) matrix.

    T = [exp(omega^), V v; 0 1] with V = I + B W + C W^2.
    """
    omega, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(jnp.square(omega), axis=-1)
    A, B, C = _sinc_coeffs(theta2)
    W = skew(omega)
    WW = W @ W
    I = jnp.eye(3, dtype=xi.dtype)
    R = I + A[..., None, None] * W + B[..., None, None] * WW
    V = I + B[..., None, None] * W + C[..., None, None] * WW
    t = jnp.einsum("...ij,...j->...i", V, v)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), xi.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def so3_log(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 3) rotation log.

    f32-stable reformulation of the reference SO3_logmap
    (como/geometry/lie_algebra.py:127): the angle comes from
    atan2(|skew part|, trace) rather than arccos, which keeps full
    precision for small angles; the theta/(2 sin theta) factor switches
    to a Taylor series below theta ~ 0.03.  (Angles at exactly pi remain
    out of scope, as in the reference.)
    """
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )  # = 2 sin(theta) * axis
    sin_t = 0.5 * jnp.sqrt(jnp.sum(jnp.square(w), axis=-1) + _EPS)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = 0.5 * (trace - 1.0)
    theta = jnp.arctan2(sin_t, cos_t)
    theta2 = theta * theta
    small = theta2 < 1e-3
    # theta / (2 sin theta) = 0.5 * (1 + theta^2/6 + 7 theta^4/360 + ...)
    mag = jnp.where(
        small,
        0.5 * (1.0 + theta2 / 6.0 + 7.0 * theta2 * theta2 / 360.0),
        theta / (2.0 * jnp.where(small, 1.0, sin_t)),
    )
    return mag[..., None] * w


def se3_log(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> (..., 6) tangent [omega, v] (V^-1 t)."""
    omega = so3_log(T[..., :3, :3])
    theta2 = jnp.sum(jnp.square(omega), axis=-1)
    t = T[..., :3, 3]
    W = skew(omega)
    WW = W @ W
    # V^-1 = I - 1/2 W + coef W^2, coef = (1 - A/(2B))/theta^2;
    # wide Taylor window: the closed form cancels catastrophically in f32
    # below theta ~ 0.03.
    A, B, _ = _sinc_coeffs(theta2)
    small = theta2 < 1e-3
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0,
        (1.0 - A / (2.0 * B + _EPS)) / (theta2 + _EPS),
    )
    I = jnp.eye(3, dtype=T.dtype)
    Vinv = I - 0.5 * W + coef[..., None, None] * WW
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([omega, v], axis=-1)


def invert_se3(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> (..., 4, 4) rigid inverse (reference invertSE3)."""
    Rt = jnp.swapaxes(T[..., :3, :3], -1, -2)
    t = -jnp.einsum("...ij,...j->...i", Rt, T[..., :3, 3])
    top = jnp.concatenate([Rt, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def adjoint(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> (..., 6, 6) adjoint in [omega, v] block order:
    Adj = [[R, 0], [t^ R, R]] (reference adjoint_matrix)."""
    R = T[..., :3, :3]
    tR = skew(T[..., :3, 3]) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, Z], axis=-1)
    bottom = jnp.concatenate([tR, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def invert_se3_jac(T: jax.Array):
    """Inverse + Jacobian dT^-1/dT = -Adj(T) (reference invertSE3_J)."""
    return invert_se3(T), -adjoint(T)


def retract(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Right-multiplicative update T <- T @ exp(xi) (reference batch_se3)."""
    return T @ se3_exp(xi)


def normalize_rotation(T: jax.Array) -> jax.Array:
    """Re-orthonormalize the rotation block via SVD (reference
    normalizeSE3_inplace), returning a new matrix (functional)."""
    R = T[..., :3, :3]
    U, _, Vh = jnp.linalg.svd(R)
    # keep det +1
    det = jnp.linalg.det(U @ Vh)
    S = jnp.ones(T.shape[:-2] + (3,), dtype=T.dtype)
    S = S.at[..., 2].set(det)
    Rn = (U * S[..., None, :]) @ Vh
    return T.at[..., :3, :3].set(Rn)


# ---------------------------------------------------------------------------
# numpy-side pose <-> (t, quaternion) conversions for trajectory I/O
# (reference pose_to_tq / tq_to_pose; used by the TUM trajectory writer).

def pose_to_tq(pose: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation

    if pose.ndim == 2:
        q = Rotation.from_matrix(pose[:3, :3]).as_quat()
        return np.concatenate([pose[:3, 3], q], axis=0)
    q = Rotation.from_matrix(pose[:, :3, :3]).as_quat()
    return np.concatenate([pose[:, :3, 3], q], axis=1)


def tq_to_pose(tq: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation

    single = tq.ndim == 1
    tq2 = tq[None] if single else tq
    T = np.tile(np.eye(4), (tq2.shape[0], 1, 1))
    T[:, :3, :3] = Rotation.from_quat(tq2[:, 3:]).as_matrix()
    T[:, :3, 3] = tq2[:, :3]
    return T[0] if single else T
