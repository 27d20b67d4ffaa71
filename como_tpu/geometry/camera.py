"""Pinhole camera model with hand-derived Jacobians (pure JAX).

Reference spec: como/geometry/camera.py.  Conventions:
  * K is a (3, 3) intrinsics matrix,
  * pixel coords `p` are (x, y) = (col, row) order ("xy"),
  * 3D camera points P are (..., 3); depth z = P[..., 2].
Jacobians are returned alongside values (verified vs jax.jacfwd in
tests/test_camera.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_intrinsics(K: jax.Array, scale_yx) -> jax.Array:
    """Rescale K for an image resize with per-axis scale factors (sy, sx).

    Matches the reference's convention where the principal point also
    absorbs the half-pixel shift implied by resizing
    (reference resize_intrinsics: K' = diag-ish(T) @ K with
    T = [[sx,0,sx],[0,sy,sy],[0,0,1]]).
    """
    sy, sx = scale_yx[0], scale_yx[1]
    T = jnp.array([[sx, 0.0, sx], [0.0, sy, sy], [0.0, 0.0, 1.0]], dtype=K.dtype)
    return T @ K


def project(K: jax.Array, P: jax.Array):
    """Project camera points to pixels. P (..., 3) -> p (..., 2), dp_dP (..., 2, 3)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z = P[..., 2]
    u = fx * P[..., 0] / z
    v = fy * P[..., 1] / z
    p = jnp.stack([u + cx, v + cy], axis=-1)

    zero = jnp.zeros_like(u)
    row0 = jnp.stack([jnp.broadcast_to(fx, u.shape), zero, -u], axis=-1)
    row1 = jnp.stack([zero, jnp.broadcast_to(fy, v.shape), -v], axis=-1)
    dp_dP = jnp.stack([row0, row1], axis=-2) / z[..., None, None]
    return p, dp_dP


def backproject(K: jax.Array, p: jax.Array, z: jax.Array):
    """Unproject pixels (..., 2) at depth z (..., 1) -> P (..., 3), dP_dz (..., 3, 1)."""
    rx = (p[..., 0] - K[0, 2]) / K[0, 0]
    ry = (p[..., 1] - K[1, 2]) / K[1, 1]
    ray = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)
    P = z * ray
    return P, ray[..., None]


def transform_project(K: jax.Array, Tji: jax.Array, Pi: jax.Array):
    """Fused K @ Tji[:3] applied to points, returning pixel xy and depth.

    Tji (B, 4, 4), Pi (B, N, 3) or (1, N, 3) -> p (B, N, 2), depth (B, N, 1).
    (reference transform_project)
    """
    Pmat = K[None] @ Tji[:, :3, :]  # (B, 3, 4)
    A = Pmat[:, None, :3, :3]
    b = Pmat[:, None, :3, 3]
    ph = jnp.squeeze(A @ Pi[..., None], -1) + b
    depth = ph[..., 2:3]
    p = ph[..., :2] / depth
    return p, depth
