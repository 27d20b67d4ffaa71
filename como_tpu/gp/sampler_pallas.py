"""Pallas-fused greedy-sampler loop body (the per-iteration domain pass).

TPU-native counterpart of the reference's native incremental-Cholesky op
(como/backend/src/cov_gpu.cu:162-182 `obs_info_kernel`: one CUDA thread
per domain pixel, loops over the N inducing rows, writes the new
obs_info row and downdates the variance).  Here one Pallas kernel fuses,
per domain tile resident in VMEM:

    k_id   = k(x_i, domain)                       (the 1 x D kernel row)
    obs    = (k_id - l_ni . obs_info[:, tile]) / l_ii
    var   -= obs^2
    d2     = |domain - x_i|^2 ; min_dist = min(min_dist, d2)

i.e. one HBM pass per iteration instead of the XLA chain's several
(measured 5.96 ms -> see BENCH for the fused number at D = 49k, S = 64).
The S x S triangular solve and the argmax stay XLA — they are tiny.

Kernel math mirrors gp/kernels_pallas._cross_cov_kernel (itself pinned
to the XLA twin by tests/test_pallas.py); equality of the whole sampler
against the XLA path is pinned by tests/test_sampler.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

try:  # pallas import is TPU/CPU-interpret safe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

SQRT3 = math.sqrt(3.0)
_EPS = 1e-8


def _downdate_kernel(xnT_ref, enT_ref, obs_ref, var_ref, md_ref,
                     sc_ref, lni_ref, obs_out, var_out, md_out):
    """One domain tile: xnT (2, T), enT (3, T), obs (S, T), var/md (1, T).
    sc (SMEM, 8): x0, x1, e00, e11, e01, 1/l_ii, select, scale.
    lni (SMEM, S): the triangular-solve row l_ni."""
    x0 = xnT_ref[0:1, :]
    x1 = xnT_ref[1:2, :]
    e00 = enT_ref[0:1, :]
    e11 = enT_ref[1:2, :]
    e01 = enT_ref[2:3, :]
    xi0, xi1 = sc_ref[0], sc_ref[1]
    f00, f11, f01 = sc_ref[2], sc_ref[3], sc_ref[4]
    inv_lii, sel, scale = sc_ref[5], sc_ref[6], sc_ref[7]

    d0 = x0 - xi0
    d1 = x1 - xi1
    s00 = e00 + f00
    s11 = e11 + f11
    s01 = e01 + f01
    inv_det = 1.0 / (s00 * s11 - s01 * s01)
    Q = 0.5 * inv_det * (s11 * d0 * d0 - 2.0 * s01 * d0 * d1 + s00 * d1 * d1)
    det_n = e00 * e11 - e01 * e01
    det_m = f00 * f11 - f01 * f01
    C = 2.0 * jnp.sqrt(jnp.sqrt(det_n * det_m)) * jnp.sqrt(
        jnp.maximum(inv_det, 0.0) + _EPS)
    t = SQRT3 * jnp.sqrt(Q + _EPS)
    k_id = scale * C * (1.0 + t) * jnp.exp(-t)            # (1, T)

    S = obs_ref.shape[0]
    acc = jnp.zeros_like(k_id)
    for s in range(S):  # static unroll: SMEM scalar x VMEM row FMAs
        acc += lni_ref[s] * obs_ref[s:s + 1, :]
    obs_new = (k_id - acc) * (inv_lii * sel)              # sel zeroes the row
    obs_out[0, :] = obs_new[0, :]
    var_out[0, :] = var_ref[0, :] - obs_new[0, :] * obs_new[0, :]
    d2 = d0 * d0 + d1 * d1
    md = md_ref[0:1, :]
    md_out[0, :] = jnp.where(sel > 0.0, jnp.minimum(md, d2), md)[0, :]


@functools.partial(jax.jit, static_argnames=("tile",))
def downdate_step(xnT: jax.Array, enT: jax.Array, obs_info: jax.Array,
                  var: jax.Array, min_dist_sq: jax.Array, x_i: jax.Array,
                  e_i: jax.Array, l_ni: jax.Array, l_ii: jax.Array,
                  select_i: jax.Array, signal_var, tile: int = 2048):
    """Fused loop-body domain pass.  xnT (2, Dp), enT (3, Dp) — the domain
    transposed once per sampler call; obs_info (S, Dp); var/min_dist (Dp,)
    with Dp a multiple of `tile`.  Returns (obs_new (Dp,), var', md')."""
    S, Dp = obs_info.shape
    dtype = var.dtype
    sc = jnp.stack([x_i[0], x_i[1], e_i[0], e_i[1], e_i[2],
                    1.0 / l_ii, select_i.astype(dtype),
                    jnp.asarray(signal_var, dtype)])
    grid = (Dp // tile,)
    obs_new, var_new, md_new = pl.pallas_call(
        _downdate_kernel,
        out_shape=(jax.ShapeDtypeStruct((1, Dp), dtype),
                   jax.ShapeDtypeStruct((1, Dp), dtype),
                   jax.ShapeDtypeStruct((1, Dp), dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
    )(xnT, enT, obs_info, var[None], min_dist_sq[None], sc, l_ni)
    return obs_new[0], var_new[0], md_new[0]


def pallas_available() -> bool:
    from como_tpu.gp.kernels_pallas import _tpu_in_scope
    return _HAS_PALLAS and _tpu_in_scope()
