"""DepthCov UNet in flax.linen — the learned covariance prior.

Architecture parity with the reference net (como/depth_cov/nn/UNet.py,
layers.py; DepthCovModule config: 5 levels, base 16 channels, 3 output
channels per level): ImageNet normalization, residual conv blocks with
GroupNorm(16) + LeakyReLU, maxpool-2 encoder, bilinear-upsample decoder
with skip concat, per-level 1x1 feature heads, covariance activation
(exp-clamped diagonal, tanh-bounded correlation, determinant guard — the
reference's normalize_params_cov).

TPU notes: convs run in bf16 (params in f32) with f32 accumulation —
the covariance activation clamps make the head robust to bf16 noise.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def cov_activation(params: jax.Array, det_eps: float = 1e-8,
                   corr_max: float = 0.99) -> jax.Array:
    """(..., 3) raw -> (..., 3) packed SPD covariance components
    (e00, e11, e01).  Mirrors the reference normalize_params_cov."""
    lo, hi = np.log(1e-3), np.log(1e4)
    x = jnp.exp(jnp.clip(params[..., 0], lo, hi))
    z = jnp.exp(jnp.clip(params[..., 1], lo, hi))
    corr = corr_max * jnp.tanh(params[..., 2])
    off = jnp.sqrt(jnp.maximum(x * z - det_eps, 0.0)) * corr
    return jnp.stack([x, z, off], axis=-1)


class ResidualConv(nn.Module):
    out_channels: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        act = lambda v: nn.leaky_relu(v, negative_slope=0.01)
        conv = lambda c, k, name: nn.Conv(c, (k, k), padding="SAME", name=name,
                                          dtype=self.compute_dtype)
        # the reference shares one GroupNorm instance across both convs
        norm = nn.GroupNorm(num_groups=16, name="norm", dtype=jnp.float32)
        y = act(norm(conv(self.out_channels, 3, "conv1")(x)))
        y = norm(conv(self.out_channels, 3, "conv2")(y))
        xs = conv(self.out_channels, 1, "conv3")(x)
        return act(xs + y)


class UNet(nn.Module):
    """Returns per-level covariance feature maps, coarse -> fine, NHWC."""
    num_levels: int = 5
    base_channels: int = 16
    out_channels: int = 3
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, rgb: jax.Array) -> Sequence[jax.Array]:
        # rgb: (B, H, W, 3) in [0, 1]
        x = (rgb - IMAGENET_MEAN) / IMAGENET_STD
        x = x.astype(self.compute_dtype)

        enc = [ResidualConv(self.base_channels, self.compute_dtype, name="base")(x)]
        c = self.base_channels
        for i in range(self.num_levels):
            c *= 2
            h = nn.max_pool(enc[-1], (2, 2), strides=(2, 2))
            enc.append(ResidualConv(c, self.compute_dtype, name=f"down{i}")(h))

        outs = []
        y = enc[-1]
        for i in range(self.num_levels - 1, -1, -1):
            b, hh, ww, cc = y.shape
            y = jax.image.resize(y, (b, hh * 2, ww * 2, cc), method="linear")
            y = nn.Conv(cc // 2, (3, 3), padding="SAME", name=f"up{i}_conv",
                        dtype=self.compute_dtype)(y)
            y = jnp.concatenate([y, enc[i]], axis=-1)
            y = ResidualConv(cc // 2, self.compute_dtype, name=f"up{i}_block")(y)
            f = nn.Conv(self.out_channels, (1, 1), name=f"head{i}",
                        dtype=jnp.float32)(y.astype(jnp.float32))
            outs.append(cov_activation(f))
        return outs  # coarse -> fine; outs[-1] is the finest (full-res) level


def init_unet(key, img_size=(192, 256)):
    model = UNet()
    div = 2 ** model.num_levels
    assert img_size[0] % div == 0 and img_size[1] % div == 0, (
        f"UNet needs image sides divisible by {div}, got {img_size}")
    params = model.init(key, jnp.zeros((1, img_size[0], img_size[1], 3)))
    return model, params


def cov_params_from_rgb_unet(model: UNet, params, rgb_nchw: jax.Array) -> jax.Array:
    """(1, 3, H, W) -> (3, H, W) packed covariance at the finest level.

    The reference runs the net at 192x256 and uses level -1 (finest,
    full resolution; cov_level=-1 in Mapping.load_model)."""
    x = jnp.transpose(rgb_nchw, (0, 2, 3, 1))
    outs = model.apply(params, x)
    finest = outs[-1]  # (1, H, W, 3)
    return jnp.transpose(finest[0], (2, 0, 1))
