"""Unified DepthCov prior interface (analog of the reference
DepthCovModule + Mapping.run_model: net at 192x256, finest level, cov
image resized to the working resolution).

Two backends:
  * "analytic" — structure-tensor prior, no checkpoint (default; the
    reference's trained ckpt is not redistributable),
  * "unet" — the flax UNet (net/unet.py), weights loaded from a msgpack
    checkpoint (utils to save/load included; training script in
    scripts/train_depthcov.py).
"""

from __future__ import annotations


import jax
from flax import serialization

from como_tpu.net import analytic_prior, unet as unet_mod
from como_tpu.ops.interp import resize_bilinear

NETWORK_SIZE = (192, 256)


class DepthCovPrior:
    def __init__(self, mode: str = "analytic", model_path: str = "",
                 network_size=NETWORK_SIZE, scale: float = 1.0):
        assert mode in ("analytic", "unet")
        self.mode = mode
        self.network_size = tuple(network_size)
        self.scale = scale  # signal variance k(x,x); reference get_scale()
        self._unet = None
        self._params = None
        if mode == "unet":
            self._unet = unet_mod.UNet()
            if model_path:
                self._params = load_params(model_path)
            else:
                self._params = unet_mod.init_unet(
                    jax.random.PRNGKey(0), self.network_size)[1]
        self._jit_cov = jax.jit(self._cov_params_impl,
                                static_argnames=("out_size",))

    def _cov_params_impl(self, rgb: jax.Array, out_size):
        # run at network size, resize the covariance image back
        net_rgb = resize_bilinear(rgb, self.network_size)
        if self.mode == "analytic":
            cov = analytic_prior.cov_params_from_rgb(net_rgb)
        else:
            cov = unet_mod.cov_params_from_rgb_unet(self._unet, self._params, net_rgb)
        if tuple(out_size) != self.network_size:
            cov = resize_bilinear(cov, tuple(out_size))
        return cov

    def cov_params(self, rgb: jax.Array) -> jax.Array:
        """(1, 3, H, W) rgb in [0,1] -> (3, H, W) packed covariance image
        at the input resolution."""
        return self._jit_cov(rgb, rgb.shape[-2:])

    def pure_fn(self):
        """(fn, params) where fn(params, rgb, out_size) is the un-jitted
        covariance computation — for fusing the per-keyframe net inference
        into a larger device program (one dispatch instead of two; on a
        remote-attached TPU each dispatch is a round trip)."""
        return self._cov_params_impl_pure, self._params

    def _cov_params_impl_pure(self, params, rgb, out_size):
        net_rgb = resize_bilinear(rgb, self.network_size)
        if self.mode == "analytic":
            cov = analytic_prior.cov_params_from_rgb(net_rgb)
        else:
            cov = unet_mod.cov_params_from_rgb_unet(self._unet, params, net_rgb)
        if tuple(out_size) != self.network_size:
            cov = resize_bilinear(cov, tuple(out_size))
        return cov


def save_params(params, path: str):
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str):
    model, template = unet_mod.init_unet(jax.random.PRNGKey(0), NETWORK_SIZE)
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
