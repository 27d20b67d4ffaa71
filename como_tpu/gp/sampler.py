"""Greedy conditional-entropy inducing-point selection, TPU-native.

Spec: reference como/depth_cov/core/samplers.py (greedy loop) and the
native incremental-Cholesky op como/backend/src/cov_cpu.cpp:66-85 /
cov_gpu.cu:132-182.  The algorithm selects up to NUM_SLOTS anchor pixels
by repeatedly taking the site with the largest GP posterior stdev
(with a min-distance NMS), then performs a rank-1 incremental Cholesky
update of the anchor covariance and downdates the posterior variance of
the whole domain.

TPU redesign (vs the reference's host loop calling CUDA kernels):
  * one jitted `lax.fori_loop` with *fully static shapes*:
      - L is a fixed (S, S) lower factor initialized to identity; solving
        against the identity rows yields exact zeros, so a growing factor
        is emulated without dynamic shapes (same trick the reference uses
        to preallocate L, generalized to the whole update),
      - pre-existing anchors occupy a packed prefix of the S slots and are
        consumed by the same rank-1 update path (uniform loop body),
      - early termination / distance NMS become masks, never shape changes,
  * the per-step domain work (1xD kernel row + (S)x(S,D) matvec + var /
    NMS downdates) is ONE fused Pallas kernel per iteration on TPU for
    large domains (sampler_pallas.downdate_step — the analog of the
    reference's obs_info_kernel, cov_gpu.cu:162-182); plain XLA
    elsewhere.  Equality between the two paths is pinned by
    tests/test_sampler.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from como_tpu.gp import kernels

HIGH = lax.Precision.HIGHEST


class SamplerResult(NamedTuple):
    coords_norm: jax.Array   # (S, 2) selected site coords (normalized)
    covs: jax.Array          # (S, 3) packed covariances at selected sites
    domain_inds: jax.Array   # (S,) int32 index into the domain; -1 for
                             #     pre-existing anchors or unused slots
    valid: jax.Array         # (S,) bool slot validity
    is_new: jax.Array        # (S,) bool freshly sampled (valid & not existing)


def _pairwise_cross_row(x_i, e_i, xs, es, scale):
    """k(x_i, xs) for a single site vs a set: (D,)."""
    return kernels.cross_covariance(x_i[None], e_i[None], xs, es, scale)[0]


@partial(jax.jit, static_argnames=("num_slots", "terminate_early"))
def greedy_entropy_sample(
    domain_norm: jax.Array,      # (D, 2) candidate coords (normalized)
    e_domain: jax.Array,         # (D, 3) packed covs at candidates
    domain_valid: jax.Array,     # (D,) bool
    curr_norm: jax.Array,        # (S, 2) existing anchors, packed prefix
    curr_e: jax.Array,           # (S, 3)
    curr_valid: jax.Array,       # (S,) bool (packed prefix mask)
    curr_var: jax.Array,         # (S,) extra diagonal variance of existing
    signal_var,                  # scalar k(x,x) scale
    fixed_var: float = 0.0,
    max_stdev_thresh: float = -1e8,
    dist_thresh: float = 0.0,
    num_slots: int = 64,
    terminate_early: bool = False,
) -> SamplerResult:
    D = domain_norm.shape[0]
    S = num_slots
    dtype = domain_norm.dtype
    signal_var = jnp.asarray(signal_var, dtype)

    # fused Pallas loop body for large domains on TPU (keyframe-insertion
    # hot path: D = H*W ~ 49k); XLA for small domains / other backends
    from como_tpu.gp import sampler_pallas as sp
    tile = 2048
    use_fused = (sp.pallas_available() and dtype == jnp.float32
                 and D >= 2 * tile)
    if use_fused:
        Dp = ((D + tile - 1) // tile) * tile
        pad = Dp - D
        # padded sites: far-away decoupled unit covs, invalid
        domain_norm = jnp.concatenate(
            [domain_norm, jnp.full((pad, 2), -100.0, dtype)], 0)
        e_pad = jnp.tile(jnp.array([1.0, 1.0, 0.0], dtype), (pad, 1))
        e_domain = jnp.concatenate([e_domain, e_pad], 0)
        domain_valid = jnp.concatenate(
            [domain_valid, jnp.zeros((pad,), bool)], 0)
        xnT = domain_norm.T.copy()                 # (2, Dp), once per call
        enT = e_domain.T.copy()                    # (3, Dp)
        D = Dp

    det_domain = e_domain[..., 0] * e_domain[..., 1] - e_domain[..., 2] ** 2
    dist_thresh_sq = dist_thresh * dist_thresh
    any_existing = jnp.any(curr_valid)

    init = dict(
        L=jnp.eye(S, dtype=dtype),
        # L^-1, maintained incrementally alongside L: appending the row
        # [l_ni, l_ii] to L appends [-(l_ni^T Linv)/l_ii, 1/l_ii] to Linv.
        # This turns the per-iteration triangular solve (64 sequential
        # steps, the loop's serial bottleneck on TPU) into two (S, S)
        # matvecs.
        Linv=jnp.eye(S, dtype=dtype),
        obs_info=jnp.zeros((S, D), dtype=dtype),
        var=jnp.full((D,), signal_var, dtype=dtype),
        min_dist_sq=jnp.full((D,), jnp.inf, dtype=dtype),
        sel_x=jnp.zeros((S, 2), dtype=dtype),
        sel_e=jnp.zeros((S, 3), dtype=dtype),
        sel_ind=jnp.full((S,), -1, jnp.int32),
        sel_valid=jnp.zeros((S,), bool),
        done=jnp.asarray(False),
    )

    def body(i, st):
        existing_i = curr_valid[i]

        # -- candidate scoring (posterior stdev + NMS) ---------------------
        stdev = jnp.sqrt(jnp.maximum(st["var"], 0.0)) + 1e-10
        nms_ok = st["min_dist_sq"] > dist_thresh_sq
        cost = stdev * nms_ok * domain_valid
        # seed heuristic: with no anchors yet, stdev is flat -> pick the
        # widest kernel (max determinant), as the reference does.
        first_seed = jnp.logical_and(i == 0, jnp.logical_not(any_existing))
        cost = jnp.where(first_seed, det_domain * domain_valid, cost)
        best = jnp.argmax(cost)
        max_stdev = stdev[best]

        done = st["done"]
        if terminate_early:
            done = jnp.logical_or(
                done,
                jnp.logical_and(jnp.logical_not(existing_i), max_stdev < max_stdev_thresh),
            )
        # no selectable site left (all costs zero: domain exhausted / fully
        # NMS-suppressed / nothing valid) -> stop instead of picking junk
        done = jnp.logical_or(
            done, jnp.logical_and(jnp.logical_not(existing_i), cost[best] <= 0.0))
        select_i = jnp.logical_or(existing_i, jnp.logical_not(done))

        # -- chosen site ----------------------------------------------------
        x_i = jnp.where(existing_i, curr_norm[i], domain_norm[best])
        e_i = jnp.where(existing_i, curr_e[i], e_domain[best])
        k_ii = signal_var + fixed_var + jnp.where(existing_i, curr_var[i], 0.0)
        ind_i = jnp.where(existing_i, -1, jnp.where(select_i, best, -1)).astype(jnp.int32)

        # -- rank-1 incremental Cholesky + variance downdate ----------------
        # (equivalent of the native get_new_chol_obs_info)
        k_ni = _pairwise_cross_row(x_i, e_i, st["sel_x"], st["sel_e"], signal_var)
        k_ni = k_ni * st["sel_valid"].astype(dtype)
        l_ni = jnp.matmul(st["Linv"], k_ni[:, None], precision=HIGH)[:, 0]
        l_ii = jnp.sqrt(jnp.maximum(k_ii - jnp.sum(jnp.square(l_ni)), 1e-12))
        if use_fused:
            obs_new, var, min_dist_sq = sp.downdate_step(
                xnT, enT, st["obs_info"], st["var"], st["min_dist_sq"],
                x_i, e_i, l_ni, l_ii, select_i, signal_var, tile=tile)
        else:
            k_id = _pairwise_cross_row(x_i, e_i, domain_norm, e_domain,
                                       signal_var)
            obs_new = (k_id - jnp.matmul(l_ni, st["obs_info"],
                                         precision=HIGH)) / l_ii
            obs_new = obs_new * select_i
            var = st["var"] - jnp.square(obs_new)
            d2 = jnp.sum(jnp.square(domain_norm - x_i[None]), axis=-1)
            min_dist_sq = jnp.where(select_i,
                                    jnp.minimum(st["min_dist_sq"], d2),
                                    st["min_dist_sq"])

        sel = select_i.astype(dtype)
        L = st["L"].at[i, :].set(l_ni * sel)
        L = L.at[i, i].set(jnp.where(select_i, l_ii, 1.0))
        linv_row = -jnp.matmul(l_ni[None, :], st["Linv"],
                               precision=HIGH)[0] / l_ii
        Linv = st["Linv"].at[i, :].set(linv_row * sel)
        Linv = Linv.at[i, i].set(jnp.where(select_i, 1.0 / l_ii, 1.0))
        obs_info = st["obs_info"].at[i, :].set(obs_new)

        return dict(
            L=L, Linv=Linv, obs_info=obs_info, var=var,
            min_dist_sq=min_dist_sq,
            sel_x=st["sel_x"].at[i].set(x_i * sel),
            sel_e=st["sel_e"].at[i].set(e_i * sel),
            sel_ind=st["sel_ind"].at[i].set(ind_i),
            sel_valid=st["sel_valid"].at[i].set(select_i),
            done=done,
        )

    st = lax.fori_loop(0, S, body, init)
    is_new = jnp.logical_and(st["sel_valid"], st["sel_ind"] >= 0)
    return SamplerResult(
        coords_norm=st["sel_x"], covs=st["sel_e"], domain_inds=st["sel_ind"],
        valid=st["sel_valid"], is_new=is_new,
    )


def pack_prefix(coords: jax.Array, mask: jax.Array, *extras):
    """Stable-pack masked rows to the front (device-side), preserving order.

    Returns (packed_coords, packed_mask, *packed_extras).  Used to feed
    pre-existing anchors to the sampler as a packed prefix.
    """
    order = jnp.argsort(jnp.logical_not(mask), stable=True)
    out = [coords[order], mask[order]]
    for e in extras:
        out.append(e[order])
    return tuple(out)


def random_uniform_sample(key, domain_valid: jax.Array, num_slots: int):
    """Uniform anchor sampling without replacement over valid domain sites
    (reference samplers.random_uniform — the alternative to greedy
    conditional entropy selected by sampling.mode).  Returns (S,) indices
    + validity (invalid when fewer valid sites than slots)."""
    D = domain_valid.shape[0]
    g = jax.random.gumbel(key, (D,))
    score = jnp.where(domain_valid, g, -jnp.inf)
    _, idx = jax.lax.top_k(score, num_slots)
    valid = jnp.take(domain_valid, idx)
    return idx.astype(jnp.int32), valid


def full_image_domain(cov_img: jax.Array, border: int = 0):
    """Domain arrays for a packed (3, H, W) covariance image: normalized
    coords, packed covs, and a border-validity mask (reference
    get_coords_domain — but static-shape with a mask instead of cropping)."""
    from como_tpu.ops.coords import coord_grid_rc, normalize_coords

    H, W = cov_img.shape[-2:]
    rc = coord_grid_rc((H, W), dtype=cov_img.dtype)
    norm = normalize_coords(rc, jnp.array([H, W], dtype=cov_img.dtype))
    e = cov_img.reshape(3, H * W).T
    r, c = rc[:, 0], rc[:, 1]
    valid = (r >= border) & (r < H - border) & (c >= border) & (c < W - border)
    return norm, e, valid, rc
