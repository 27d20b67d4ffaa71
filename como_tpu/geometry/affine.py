"""Affine brightness (log-scale a, bias b) composition (reference como/geometry/affine_brightness.py).

aff arrays are (B, 2, 1): row 0 = a (log scale), row 1 = b (bias).
Model: I_corrected = exp(-a) * I + b composition rules below match the
reference exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_aff_w_curr(aff_w_ref: jax.Array, aff_curr_ref: jax.Array) -> jax.Array:
    a = aff_w_ref[:, 0, :] + aff_curr_ref[:, 0, :]
    b = aff_w_ref[:, 1, :] + aff_curr_ref[:, 1, :] * jnp.exp(aff_curr_ref[:, 0, :])
    return jnp.stack([a, b], axis=1)


def get_rel_aff(aff1: jax.Array, aff2: jax.Array) -> jax.Array:
    a = aff1[:, 0, :] - aff2[:, 0, :]
    b = jnp.exp(-a) * (aff1[:, 1, :] - aff2[:, 1, :])
    return jnp.stack([a, b], axis=1)
