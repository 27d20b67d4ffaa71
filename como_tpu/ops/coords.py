"""Coordinate conventions + grids (reference como/utils/coords.py).

Two coordinate layouts exist side by side, as in the reference:
  * "rc" coords: (row, col)   — used for image indexing / sampling sites,
  * "xy" pixels: (x, y)=(col,row) — used for camera projections.
`swap_xy` converts between them.  Normalized coords map pixel centers to
[-1, 1] exactly like torch.nn.functional.grid_sample(align_corners=False):
x_norm = 2*x/dim + 1/dim - 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swap_xy(coords: jax.Array) -> jax.Array:
    return jnp.stack([coords[..., 1], coords[..., 0]], axis=-1)


def normalize_coords(x_pixel: jax.Array, dims) -> jax.Array:
    """Pixel -> [-1, 1], grid_sample(align_corners=False) convention.

    `dims` ordering must match the last axis of x_pixel (e.g. (H, W) for
    rc coords).
    """
    A = 1.0 / jnp.asarray(dims, dtype=x_pixel.dtype)
    return 2.0 * A * x_pixel + A - 1.0


def unnormalize_coords(x_norm: jax.Array, dims) -> jax.Array:
    A = jnp.asarray(dims, dtype=x_norm.dtype) / 2.0
    return A * x_norm + A - 0.5


def coord_grid_rc(img_size, dtype=jnp.float32) -> jax.Array:
    """(H*W, 2) full grid of (row, col) coords, row-major."""
    h, w = img_size
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype),
                          indexing="ij")
    return jnp.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1)


def coord_img_rc(img_size, dtype=jnp.float32) -> jax.Array:
    """(H, W, 2) image of (row, col) coords."""
    h, w = img_size
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype),
                          indexing="ij")
    return jnp.stack([ys, xs], axis=-1)


def fill_image(coords_rc: jax.Array, vals: jax.Array, img_size,
               default_val=jnp.nan) -> jax.Array:
    """Scatter vals (N, 1)/(N,) at integer rc coords (N, 2) into (H, W) image.

    Out-of-bounds coords are dropped (scatter mode "drop").
    """
    h, w = img_size
    r = coords_rc[..., 0].astype(jnp.int32).reshape(-1)
    c = coords_rc[..., 1].astype(jnp.int32).reshape(-1)
    v = vals.reshape(-1)
    img = jnp.full((h, w), default_val, dtype=v.dtype)
    return img.at[r, c].set(v, mode="drop")
