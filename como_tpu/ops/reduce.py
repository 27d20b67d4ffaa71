"""Fast masked reductions for the hot paths.

The reference computes exact medians (torch.median) over ~49k residuals
inside every GN iteration — on TPU a full sort per iteration would
dominate the step.  `histogram_median` is a two-pass histogram median:
bin counts come from a one-hot matmul (MXU work), the median bin is
refined once, and the result is accurate to (range / bins^2) — orders of
magnitude below the MAD sigma's own noise.  Deterministic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

HIGH = jax.lax.Precision.HIGHEST


def _masked_hist(x: jax.Array, w: jax.Array, lo, hi, bins: int) -> jax.Array:
    """Weighted histogram of x within [lo, hi] via one-hot matmul."""
    t = (x - lo) / jnp.maximum(hi - lo, 1e-20)
    idx = jnp.clip(jnp.floor(t * bins), 0, bins - 1).astype(jnp.int32)
    onehot = jax.nn.one_hot(idx, bins, dtype=x.dtype)
    return jnp.matmul(w[None, :], onehot, precision=HIGH)[0]


@partial(jax.jit, static_argnames=("bins", "passes", "axis_name"))
def histogram_median(x: jax.Array, mask: jax.Array, bins: int = 512,
                     passes: int = 2, axis_name: str | None = None) -> jax.Array:
    """Approximate median of x[mask] (lower-middle convention ~ torch).

    Two refinement passes give resolution (max-min)/bins^passes.
    With `axis_name`, computes the median over data sharded across a mesh
    axis (histograms and extrema are psum'd/pmin'd across devices) —
    the multi-chip BA's single collective-friendly robust statistic.
    """
    x = x.reshape(-1)
    w = mask.reshape(-1).astype(x.dtype)
    n = jnp.sum(w)
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    lo = jnp.min(jnp.where(mask.reshape(-1), x, big))
    hi = jnp.max(jnp.where(mask.reshape(-1), x, -big))
    if axis_name is not None:
        n = jax.lax.psum(n, axis_name)
        lo = jax.lax.pmin(lo, axis_name)
        hi = jax.lax.pmax(hi, axis_name)
    target = (jnp.maximum(n - 1.0, 0.0)) // 2.0 + 1.0  # rank (1-based)

    for _ in range(passes):
        hist = _masked_hist(x, w, lo, hi, bins)
        if axis_name is not None:
            hist = jax.lax.psum(hist, axis_name)
        cum = jnp.cumsum(hist)
        b = jnp.argmax(cum >= target)  # first bin reaching the rank
        width = jnp.maximum(hi - lo, 1e-20) / bins
        new_lo = lo + b * width
        hi = new_lo + width
        # rank within the remaining bin
        prev = jnp.where(b > 0, cum[jnp.maximum(b - 1, 0)], 0.0)
        target = target - prev
        # restrict weights to the bin
        inside = (x >= new_lo) & (x <= hi)
        w = w * inside
        lo = new_lo

    return 0.5 * (lo + hi)


def fast_mad_sigma(r: jax.Array, mask: jax.Array,
                   axis_name: str | None = None) -> jax.Array:
    """1.4826 * median(|r[mask]|) via histogram median (hot-path MAD)."""
    return 1.4826 * histogram_median(jnp.abs(r), mask, axis_name=axis_name)
