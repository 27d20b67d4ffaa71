"""Image filtering + pyramids as XLA convolutions.

Reference spec: como/utils/image_processing.py (Scharr /32 gradients with
reflect padding, 3x3 binomial blur, blur+decimate pyramids) and
como/data/depth_resize.py (depth pyramid modes).  Implemented with
lax.conv_general_dilated in NCHW; channels handled via feature grouping.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

SCHARR_X = (1.0 / 32.0) * jnp.array(
    [[-3.0, 0.0, 3.0], [-10.0, 0.0, 10.0], [-3.0, 0.0, 3.0]], dtype=jnp.float32
)
SCHARR_Y = SCHARR_X.T
GAUSS_3 = (1.0 / 16.0) * jnp.array(
    [[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]], dtype=jnp.float32
)


def _depthwise_conv3(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """3x3 depthwise conv of NCHW x with reflect padding."""
    b, c, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
    k = jnp.broadcast_to(kernel.astype(x.dtype), (c, 1, 3, 3))
    return lax.conv_general_dilated(
        xp, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
    )


def image_gradients(x: jax.Array):
    """Scharr/32 gradients of (B, C, H, W): returns (gx, gy)."""
    return _depthwise_conv3(x, SCHARR_X), _depthwise_conv3(x, SCHARR_Y)


def gaussian_blur(x: jax.Array) -> jax.Array:
    return _depthwise_conv3(x, GAUSS_3)


@partial(jax.jit, static_argnames=("start_level", "end_level"))
def image_pyramid(x: jax.Array, start_level: int, end_level: int):
    """Blur + stride-2 decimate pyramid, coarse first (reference ordering).

    Returns a list of length (end_level - start_level) where entry 0 is the
    coarsest level (level end_level-1) and the last entry is level
    start_level.  Decimation keeps samples [0::2, 0::2] of the blurred
    image, matching the reference exactly.
    """
    pyr = []
    x_level = x
    for i in range(end_level - 1):
        if i >= start_level:
            pyr.insert(0, x_level)
        x_level = gaussian_blur(x_level)[:, :, 0::2, 0::2]
    pyr.insert(0, x_level)
    return pyr


def _avg_pool2(x):
    return 0.25 * (x[..., 0::2, 0::2] + x[..., 0::2, 1::2]
                   + x[..., 1::2, 0::2] + x[..., 1::2, 1::2])


def pyr_depth(depth: jax.Array, mode: str) -> jax.Array:
    """One level of depth downsampling (factor 2), reference pyr_depth modes."""
    if mode == "bilinear":
        return _avg_pool2(depth)
    if mode == "nearest_neighbor":
        return depth[..., 0::2, 0::2]
    if mode == "max":
        return jnp.maximum(
            jnp.maximum(depth[..., 0::2, 0::2], depth[..., 0::2, 1::2]),
            jnp.maximum(depth[..., 1::2, 0::2], depth[..., 1::2, 1::2]),
        )
    if mode == "min":
        return jnp.minimum(
            jnp.minimum(depth[..., 0::2, 0::2], depth[..., 0::2, 1::2]),
            jnp.minimum(depth[..., 1::2, 0::2], depth[..., 1::2, 1::2]),
        )
    if mode == "masked_bilinear":
        mask = ~jnp.isnan(depth)
        dm = jnp.where(mask, depth, 0.0)
        s = dm[..., 0::2, 0::2] + dm[..., 0::2, 1::2] + dm[..., 1::2, 0::2] + dm[..., 1::2, 1::2]
        m = mask.astype(depth.dtype)
        n = m[..., 0::2, 0::2] + m[..., 0::2, 1::2] + m[..., 1::2, 0::2] + m[..., 1::2, 1::2]
        return jnp.where(n > 0, s / jnp.maximum(n, 1.0), 0.0)
    raise ValueError(f"pyr_depth mode {mode} not implemented")


@partial(jax.jit, static_argnames=("start_level", "end_level", "mode"))
def depth_pyramid(depth: jax.Array, start_level: int, end_level: int, mode: str):
    pyr = []
    x_level = depth
    for i in range(end_level - 1):
        if i >= start_level:
            pyr.insert(0, x_level)
        x_level = pyr_depth(x_level, mode)
    pyr.insert(0, x_level)
    return pyr


def intrinsics_pyramid(K: jax.Array, start_level: int, end_level: int):
    """Coarse-first intrinsics for each pyramid level (reference IntrinsicsPyramidModule)."""
    from como_tpu.geometry.camera import resize_intrinsics

    pyr = []
    for i in range(start_level, end_level):
        s = 2.0 ** (-i)
        pyr.insert(0, resize_intrinsics(K, [s, s]))
    return pyr


def rgb_to_gray(rgb: jax.Array) -> jax.Array:
    """(B, 3, H, W) -> (B, 1, H, W), ITU-R 601-2 weights (torchvision parity)."""
    w = jnp.array([0.299, 0.587, 0.114], dtype=rgb.dtype)
    return jnp.einsum("bchw,c->bhw", rgb, w)[:, None]


def img_and_grads(img: jax.Array) -> jax.Array:
    """Stack (img, gx, gy) along channels: (B, C, H, W) -> (B, 3C, H, W)."""
    gx, gy = image_gradients(img)
    return jnp.concatenate([img, gx, gy], axis=1)
