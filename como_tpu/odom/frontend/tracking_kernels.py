"""Inverse-compositional photometric tracking (pyramid Lucas-Kanade).

Spec: reference como/odom/frontend/photo_tracking.py — IC alignment of
the current frame against a keyframe over an image pyramid: Jacobians
dI/d[xi, a, b] precomputed once per keyframe at identity; per iteration
warp -> bilinear sample -> robust (Huber, MAD sigma) 8x8 GN solve ->
inverse-compositional update T <- T exp(-delta), (a, b) -= delta.

TPU redesign: the reference iterates in Python with device syncs per
iteration (medians, convergence scalars pulled to host).  Here the whole
pyramid solve is ONE jitted function: each level is a lax.while_loop with
the convergence test computed on device; only the final pose crosses back
to the host.  Static shapes throughout (every pyramid level has all-pixel
sample sites; invalidity is masked).  Gray (C=1) hot path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from como_tpu.geometry import lie
from como_tpu.geometry.camera import project, transform_project
from como_tpu.ops.interp import bilinear_sample
from como_tpu.ops.reduce import fast_mad_sigma

from como_tpu.odom.backend.robust import huber as huber_weight  # noqa: F401


class TrackLevel(NamedTuple):
    """Per-pyramid-level keyframe reference data (static shapes)."""
    vals: jax.Array      # (N,) reference intensities at sample sites
    P: jax.Array         # (N, 3) 3D points in the reference KF frame
    J_ic: jax.Array      # (N, 8) IC Jacobian dI/d[xi(6), a, b] (a-col live)
    mask: jax.Array      # (N,) sample validity
    K: jax.Array         # (3, 3) level intrinsics


def precalc_ic_jacobians(grads: jax.Array, P: jax.Array, K: jax.Array) -> jax.Array:
    """IC Jacobians at identity warp: (N, 8) from image grads (N, 2) and
    3D points (N, 3).  dI/dxi = dI/dw * dp/dP * [-P^, I]; affine columns
    (a, b) filled per-iteration / with ones (reference precalc_jacobians)."""
    _, dp_dP = project(K, P)                                # (N, 2, 3)
    dP_dxi = jnp.concatenate([-lie.skew(P), jnp.broadcast_to(
        jnp.eye(3, dtype=P.dtype), P.shape[:-1] + (3, 3))], axis=-1)  # (N, 3, 6)
    dI_dxi = jnp.einsum("nk,nkj->nj", grads,
                        jnp.einsum("nij,njk->nik", dp_dP, dP_dxi))
    ab = jnp.concatenate([jnp.zeros_like(P[:, :1]), jnp.ones_like(P[:, :1])], axis=-1)
    return jnp.concatenate([dI_dxi, ab], axis=-1)


def _level_solve(Tji, aff, lvl: TrackLevel, img_j, term):
    """One pyramid level: while_loop of IC iterations on device.

    img_j is (C, H, W); the reference rows are channel-major flattened
    (C, ..., N) so channel c's samples read image channel c."""
    N = lvl.vals.shape[0]
    C, H, W = img_j.shape
    Np = N // C
    dtype = lvl.vals.dtype

    def gn_iter(Tji, aff):
        p, z = transform_project(lvl.K, Tji[None], lvl.P[None])
        p, z = p[0], z[0, :, 0]
        x, y = p[..., 0], p[..., 1]
        valid = ((x >= 1) & (x < W - 1) & (y >= 1) & (y < H - 1)
                 & (z > 0) & lvl.mask)
        I_t = jax.vmap(
            lambda img_c, p_c: bilinear_sample(img_c[None], p_c, "zeros")[0]
        )(img_j, p.reshape(C, Np, 2)).reshape(-1)            # (N,)

        a, b = aff[0], aff[1]
        tmp = jnp.exp(-a) * I_t
        r = tmp + b - lvl.vals
        J = lvl.J_ic.at[:, 6].set(-tmp)
        if not term.get("estimate_affine", True):
            # affine ablation: zero affine columns -> g[6:] = 0 and (with
            # the diagonal damping below) delta[6:] = 0 exactly, so aff
            # stays at its initial zero
            J = J.at[:, 6:].set(0.0)

        sigma = fast_mad_sigma(r, valid) + 1e-12
        wr = r / sigma
        w = huber_weight(wr) * valid / (sigma * sigma)

        Jw = J * w[:, None]
        Hm = jnp.einsum("nk,nl->kl", Jw, J)
        g = jnp.einsum("nk,n->k", Jw, r)
        total_err = jnp.sum(w * r * r)
        n_valid = jnp.maximum(jnp.sum(valid), 1)
        mean_sq = total_err / n_valid
        grad_norm = jnp.linalg.norm(g)

        L = jnp.linalg.cholesky(Hm + 1e-8 * jnp.eye(8, dtype=dtype))
        yv = jax.scipy.linalg.solve_triangular(L, g[:, None], lower=True)
        delta = jax.scipy.linalg.solve_triangular(L.T, yv, lower=False)[:, 0]
        # degenerate views (e.g. a poisoned KF reference) must not poison
        # the pose: a non-finite step freezes rather than corrupts
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)

        Tji_new = Tji @ lie.se3_exp(-delta[:6])
        aff_new = aff - delta[6:]
        return Tji_new, aff_new, jnp.linalg.norm(delta), mean_sq, grad_norm

    def cond(state):
        Tji, aff, it, prev_err, done = state
        return jnp.logical_not(done)

    def body(state):
        Tji, aff, it, prev_err, _ = state
        Tji2, aff2, dn, mean_sq, gn = gn_iter(Tji, aff)
        it2 = it + 1
        rel = jnp.abs((prev_err - mean_sq) / prev_err)
        done = ((it2 >= term["max_iter"]) | (dn < term["delta_norm"])
                | (rel < term["rel_tol"]) | (gn < term["grad_norm"])
                | (mean_sq < term.get("abs_tol", 0.0)))
        return (Tji2, aff2, it2, mean_sq, done)

    init = (Tji, aff, jnp.int32(0), jnp.asarray(jnp.inf, dtype), jnp.asarray(False))
    Tji, aff, it, _, _ = lax.while_loop(cond, body, init)
    return Tji, aff, it


@partial(jax.jit, static_argnames=("term",))
def track_pyramid(levels: Sequence[TrackLevel], img_pyr: Sequence[jax.Array],
                  Tji_init: jax.Array, aff_init: jax.Array, term) -> tuple:
    """Coarse-to-fine IC tracking.  `levels` coarse-first, matching
    img_pyr; `term` a hashable dict-like (see TermStatic).  Returns
    (Tji (4,4), aff (2,), iters_per_level)."""
    Tji, aff = Tji_init, aff_init
    iters = []
    for lvl, img in zip(levels, img_pyr):
        Tji, aff, it = _level_solve(Tji, aff, lvl, img[0], dict(term))
        iters.append(it)
    return Tji, aff, jnp.stack(iters)


class TermStatic(NamedTuple):
    """Hashable termination criteria + solve switches (static arg to jit)."""
    max_iter: int
    delta_norm: float
    rel_tol: float
    grad_norm: float
    abs_tol: float = 0.0  # mean-squared-residual floor (0 = disabled)
    estimate_affine: bool = True  # False: affine states pinned at zero

    def keys(self):
        return self._fields

    def __getitem__(self, k):
        if isinstance(k, str):
            return getattr(self, k)
        return tuple.__getitem__(self, k)
