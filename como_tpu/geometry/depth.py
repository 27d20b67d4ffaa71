"""Log-depth parameterization + GP conditioning mean (reference como/geometry/depth.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_depth_to_depth(log_depth: jax.Array):
    depth = jnp.exp(log_depth)
    return depth, depth[..., None]  # dz/dlogz = z


def depth_to_log_depth(depth: jax.Array):
    return jnp.log(depth), (1.0 / depth)[..., None]


def predict_log_depth(logz_m: jax.Array, Knm_Kmminv: jax.Array):
    """GP conditional mean: logz_n = Knm Kmm^-1 logz_m.

    logz_m (B, M, 1), Knm_Kmminv (B, N, M) -> logz_n (B, N, 1),
    dlogzn_dlogzm (B, N, 1, M).
    """
    logz_n = Knm_Kmminv @ logz_m
    return logz_n, Knm_Kmminv[..., None, :]


def backproject_depth_img(depth_img: jax.Array, K: jax.Array) -> jax.Array:
    """(B, 1, H, W) depth -> (B, 3, H, W) camera points."""
    h, w = depth_img.shape[-2:]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=depth_img.dtype),
                          jnp.arange(w, dtype=depth_img.dtype), indexing="ij")
    rx = (xs - K[0, 2]) / K[0, 0]
    ry = (ys - K[1, 2]) / K[1, 1]
    r = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=0)[None]
    return depth_img * r
