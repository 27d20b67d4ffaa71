"""Robust IRLS weight functions (reference como/odom/backend/robust_loss.py:
squared, Huber k=1.345, Tukey t=4.6851).  Like the reference, the
photometric factors hard-wire Huber at their call sites."""

from __future__ import annotations

import jax
import jax.numpy as jnp

HUBER_K = 1.345
TUKEY_T = 4.6851


def squared(r: jax.Array) -> jax.Array:
    return jnp.ones_like(r)


def huber(r: jax.Array, k: float = HUBER_K) -> jax.Array:
    ra = jnp.abs(r)
    return jnp.where(ra < k, 1.0, k / jnp.maximum(ra, 1e-20))


def tukey(r: jax.Array, t: float = TUKEY_T) -> jax.Array:
    ra = jnp.abs(r)
    tmp = 1.0 - jnp.square(ra / t)
    return jnp.where(ra < t, tmp * tmp, 0.0)
