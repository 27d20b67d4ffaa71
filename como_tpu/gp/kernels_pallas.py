"""Pallas TPU kernel for the GP cross-covariance.

TPU-native counterpart of the reference's native op
como_backends.cross_covariance (cov_cpu.cpp:17-64 / cov_gpu.cu:18-55,
one CUDA thread per (i, j) pair): computes
K[n, m] = scale * C(E_n, E_m) * matern32(Q(x_n, x_m, E_n, E_m)) in one
fused VMEM-resident kernel, tiled over the (large) N axis with the full
(small) anchor set resident per tile.

Layout: domain sites tiled (TILE_N, 1) per field; anchors broadcast as
(1, M_pad) rows with a validity column mask (M padded to the 128-lane
width).  Everything is VPU elementwise work; the win over plain XLA is
fusion of the ~20-op chain into one pass over HBM.

Falls back to the XLA implementation (gp/kernels.py) off-TPU; equality is
pinned by tests/test_pallas.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from como_tpu.gp import kernels as xla_kernels

try:  # pallas import is TPU/CPU-interpret safe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

SQRT3 = math.sqrt(3.0)
_EPS = 1e-8


def _cross_cov_kernel(xn_ref, en_ref, xm_ref, em_ref, scale_ref, out_ref):
    # xn (T, 2), en (T, 3): domain tile; xm (1, Mp*2), em (1, Mp*3) anchors
    T = xn_ref.shape[0]
    Mp = out_ref.shape[1]
    x0 = xn_ref[:, 0:1]
    x1 = xn_ref[:, 1:2]
    e00 = en_ref[:, 0:1]
    e11 = en_ref[:, 1:2]
    e01 = en_ref[:, 2:3]

    m = xm_ref[0, :].reshape(2, Mp)
    me = em_ref[0, :].reshape(3, Mp)
    mx0 = m[0:1, :]
    mx1 = m[1:2, :]
    f00 = me[0:1, :]
    f11 = me[1:2, :]
    f01 = me[2:3, :]

    d0 = x0 - mx0                       # (T, Mp)
    d1 = x1 - mx1
    s00 = e00 + f00
    s11 = e11 + f11
    s01 = e01 + f01
    det_s = s00 * s11 - s01 * s01
    inv_det = 1.0 / det_s
    Q = 0.5 * inv_det * (s11 * d0 * d0 - 2.0 * s01 * d0 * d1 + s00 * d1 * d1)

    det_n = e00 * e11 - e01 * e01       # (T, 1)
    det_m = f00 * f11 - f01 * f01       # (1, Mp)
    C = 2.0 * jnp.sqrt(jnp.sqrt(det_n * det_m)) * jnp.sqrt(
        jnp.maximum(inv_det, 0.0) + _EPS)

    t = SQRT3 * jnp.sqrt(Q + _EPS)
    out_ref[:, :] = scale_ref[0] * C * (1.0 + t) * jnp.exp(-t)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def cross_covariance_pallas(x_n: jax.Array, e_n: jax.Array, x_m: jax.Array,
                            e_m: jax.Array, scale, tile_n: int = 512) -> jax.Array:
    """(N, 2), (N, 3) x (M, 2), (M, 3) -> (N, M).  N padded to tile_n,
    M padded to 128 lanes internally."""
    N, M = x_n.shape[0], x_m.shape[0]
    dtype = x_n.dtype
    Mp = max(128, ((M + 127) // 128) * 128)
    Np = ((N + tile_n - 1) // tile_n) * tile_n

    xn = jnp.zeros((Np, 2), dtype).at[:N].set(x_n)
    en = jnp.ones((Np, 3), dtype).at[:, 2].set(0.0).at[:N].set(e_n)
    # pad anchors with decoupled unit covs far away (values sliced off)
    xm = jnp.full((Mp, 2), -100.0, dtype).at[:M].set(x_m)
    em = jnp.ones((Mp, 3), dtype).at[:, 2].set(0.0).at[:M].set(e_m)
    xm_flat = xm.T.reshape(1, 2 * Mp)
    em_flat = em.T.reshape(1, 3 * Mp)
    scale_arr = jnp.asarray([scale], dtype)

    out = pl.pallas_call(
        _cross_cov_kernel,
        out_shape=jax.ShapeDtypeStruct((Np, Mp), dtype),
        grid=(Np // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * Mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * Mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, Mp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(xn, en, xm_flat, em_flat, scale_arr)
    return out[:N, :M]


def _tpu_in_scope() -> bool:
    """True when the computation will land on a TPU: honors a pinned
    jax.default_device (stage->device placement can put one stage on CPU
    while the process default backend is TPU), else the default backend."""
    dd = jax.config.jax_default_device
    if dd is not None:
        platform = dd if isinstance(dd, str) else dd.platform
        return platform == "tpu"
    return jax.default_backend() == "tpu"


def cross_covariance(x_n, e_n, x_m, e_m, scale):
    """Pallas on TPU, XLA elsewhere."""
    if _HAS_PALLAS and _tpu_in_scope():
        return cross_covariance_pallas(x_n, e_n, x_m, e_m, scale)
    return xla_kernels.cross_covariance(x_n, e_n, x_m, e_m, scale)
