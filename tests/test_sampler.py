"""Greedy conditional-entropy sampler: validated against a brute-force
reference implementation (full Cholesky recompute every step)."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from como_tpu.gp import kernels, sampler


def small_domain(rng, d=60):
    x = rng.uniform(-1, 1, size=(d, 2)).astype(np.float32)
    e = np.abs(rng.normal(size=(d, 3)).astype(np.float32)) * 0.3 + 0.1
    e[:, 2] = 0.0
    return jnp.array(x), jnp.array(e)


def brute_force_greedy(x, e, n_sel, signal_var=1.0):
    """Recompute the exact posterior variance each step; argmax stdev."""
    D = x.shape[0]
    chosen = [int(np.argmax(np.array(e[:, 0] * e[:, 1] - e[:, 2] ** 2)))]
    for _ in range(n_sel - 1):
        xs, es = x[jnp.array(chosen)], e[jnp.array(chosen)]
        K_mm = np.array(kernels.cross_covariance(xs, es, xs, es, signal_var))
        K_md = np.array(kernels.cross_covariance(xs, es, x, e, signal_var))
        sol = np.linalg.solve(K_mm + 1e-9 * np.eye(len(chosen)), K_md)
        var = signal_var - np.sum(K_md * sol, axis=0)
        var[chosen] = -np.inf
        chosen.append(int(np.argmax(var)))
    return chosen


def test_greedy_matches_bruteforce():
    rng = np.random.default_rng(0)
    x, e = small_domain(rng)
    S = 8
    res = sampler.greedy_entropy_sample(
        x, e, jnp.ones((x.shape[0],), bool),
        jnp.zeros((S, 2)), jnp.zeros((S, 3)), jnp.zeros((S,), bool), jnp.zeros((S,)),
        signal_var=1.0, num_slots=S,
    )
    got = list(np.array(res.domain_inds))
    want = brute_force_greedy(x, e, S)
    assert got == want
    assert bool(np.all(np.array(res.valid)))


def test_variance_decreases():
    rng = np.random.default_rng(1)
    x, e = small_domain(rng, d=100)
    S = 16
    res = sampler.greedy_entropy_sample(
        x, e, jnp.ones((100,), bool),
        jnp.zeros((S, 2)), jnp.zeros((S, 3)), jnp.zeros((S,), bool), jnp.zeros((S,)),
        signal_var=1.0, num_slots=S,
    )
    # selected sites should all be distinct
    inds = np.array(res.domain_inds)
    assert len(set(inds.tolist())) == S


def test_existing_prefix_respected():
    rng = np.random.default_rng(2)
    x, e = small_domain(rng)
    S = 8
    curr = jnp.zeros((S, 2)).at[0].set(x[5]).at[1].set(x[17])
    curr_e = jnp.zeros((S, 3)).at[0].set(e[5]).at[1].set(e[17])
    curr_valid = jnp.zeros((S,), bool).at[0].set(True).at[1].set(True)
    res = sampler.greedy_entropy_sample(
        x, e, jnp.ones((x.shape[0],), bool),
        curr, curr_e, curr_valid, jnp.zeros((S,)),
        signal_var=1.0, num_slots=S,
    )
    inds = np.array(res.domain_inds)
    assert inds[0] == -1 and inds[1] == -1          # existing: no domain ind
    assert bool(np.all(np.array(res.valid)))
    assert not np.array(res.is_new)[0] and np.array(res.is_new)[2]
    # newly sampled sites should avoid re-picking the existing ones
    assert 5 not in inds[2:] and 17 not in inds[2:]


def test_early_termination():
    rng = np.random.default_rng(3)
    x, e = small_domain(rng, d=30)
    S = 25
    res = sampler.greedy_entropy_sample(
        x, e, jnp.ones((30,), bool),
        jnp.zeros((S, 2)), jnp.zeros((S, 3)), jnp.zeros((S,), bool), jnp.zeros((S,)),
        signal_var=1.0, num_slots=S, terminate_early=True, max_stdev_thresh=0.5,
    )
    v = np.array(res.valid)
    assert v[0] and not v[-1]           # stopped before filling all slots
    # validity is a packed prefix
    first_invalid = int(np.argmin(v))
    assert not v[first_invalid:].any()


def test_dist_thresh_nms():
    # cluster of nearly identical points + one far point: with a distance
    # threshold the sampler must not pick two points from the cluster
    x = jnp.array([[0.0, 0.0], [0.001, 0.0], [0.0, 0.001], [0.9, 0.9]], jnp.float32)
    e = jnp.full((4, 3), 0.2).at[:, 2].set(0.0)
    S = 3
    res = sampler.greedy_entropy_sample(
        x, e, jnp.ones((4,), bool),
        jnp.zeros((S, 2)), jnp.zeros((S, 3)), jnp.zeros((S,), bool), jnp.zeros((S,)),
        signal_var=1.0, num_slots=S, dist_thresh=0.1,
    )
    inds = set(np.array(res.domain_inds).tolist())
    assert 3 in inds
    assert len(inds & {0, 1, 2}) <= 1 + (1 if -1 in inds else 0)


def test_pack_prefix():
    coords = jnp.arange(10, dtype=jnp.float32).reshape(5, 2)
    mask = jnp.array([False, True, False, True, False])
    pc, pm = sampler.pack_prefix(coords, mask)
    np.testing.assert_array_equal(np.array(pm), [True, True, False, False, False])
    np.testing.assert_allclose(np.array(pc[:2]), [[2, 3], [6, 7]])


def test_fused_downdate_matches_xla(monkeypatch):
    """The Pallas-fused loop body (sampler_pallas.downdate_step) must
    reproduce the XLA path: same selected sites, same factor/obs state
    (interpret mode; on-TPU equality is exercised by the insertion path)."""
    import jax.experimental.pallas.tpu as pltpu

    from como_tpu.gp import sampler, sampler_pallas

    if not sampler_pallas._HAS_PALLAS:
        pytest.skip("pallas unavailable")

    rng = np.random.default_rng(5)
    D, S = 4096, 8
    dom = jnp.array(rng.uniform(-1, 1, (D, 2)), jnp.float32)
    e00 = rng.uniform(0.5, 2.0, D)
    e11 = rng.uniform(0.5, 2.0, D)
    e01 = rng.uniform(-0.3, 0.3, D) * np.sqrt(e00 * e11)
    e = jnp.array(np.stack([e00, e11, e01], -1), jnp.float32)
    valid = jnp.array(rng.uniform(size=D) > 0.1)
    zeros = (jnp.zeros((S, 2), jnp.float32), jnp.zeros((S, 3), jnp.float32),
             jnp.zeros((S,), bool), jnp.zeros((S,), jnp.float32))

    def run():
        return sampler.greedy_entropy_sample(
            dom, e, valid, *zeros, signal_var=1.0, fixed_var=0.0,
            max_stdev_thresh=1e-3, dist_thresh=5e-2, num_slots=S,
            terminate_early=False)

    res_xla = run()

    monkeypatch.setattr(sampler_pallas, "pallas_available", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        res_fused = jax.jit(run)()  # fresh trace under the patched gate

    np.testing.assert_array_equal(np.array(res_xla.domain_inds),
                                  np.array(res_fused.domain_inds))
    np.testing.assert_allclose(np.array(res_xla.coords_norm),
                               np.array(res_fused.coords_norm), atol=1e-6)
    np.testing.assert_allclose(np.array(res_xla.covs),
                               np.array(res_fused.covs), atol=1e-6)


def greedy_with_trisolve(x, e, n_sel, signal_var=1.0):
    """Mirror of the greedy loop using the backward-stable triangular
    solve per step (the implementation the maintained-inverse redesign
    replaced, ADVICE round 2): l_ni = solve(L[:i,:i], k_ni).  Pins the
    inverse-factor path's selections on ill-conditioned domains."""
    import scipy.linalg as sla
    x_np = np.array(x, np.float32)
    e_np = np.array(e, np.float32)
    D = x_np.shape[0]
    det = e_np[:, 0] * e_np[:, 1] - e_np[:, 2] ** 2
    var = np.full(D, signal_var, np.float32)
    L = np.zeros((n_sel, n_sel), np.float32)
    obs_info = np.zeros((n_sel, D), np.float32)
    chosen = []
    for i in range(n_sel):
        stdev = np.sqrt(np.maximum(var, 0.0)) + 1e-10
        cost = det if i == 0 else stdev
        best = int(np.argmax(cost))
        chosen.append(best)
        xi, ei = jnp.array(x_np[best])[None], jnp.array(e_np[best])[None]
        if i > 0:
            xs = jnp.array(x_np[chosen[:-1]])
            es = jnp.array(e_np[chosen[:-1]])
            k_ni = np.array(
                kernels.cross_covariance(xi, ei, xs, es, signal_var)
            )[0].astype(np.float32)
            l_ni = sla.solve_triangular(L[:i, :i], k_ni, lower=True)
            l_ni = l_ni.astype(np.float32)
        else:
            l_ni = np.zeros((0,), np.float32)
        l_ii = np.float32(np.sqrt(max(signal_var - float(l_ni @ l_ni), 1e-12)))
        k_id = np.array(
            kernels.cross_covariance(xi, ei, jnp.array(x_np), jnp.array(e_np),
                                     signal_var))[0].astype(np.float32)
        obs_new = ((k_id - l_ni @ obs_info[:i]) / l_ii).astype(np.float32)
        var = var - obs_new ** 2
        L[i, :i] = l_ni
        L[i, i] = l_ii
        obs_info[i] = obs_new
    return chosen, var


def test_clustered_sites_match_trisolve():
    """Near-duplicate candidate sites make K_nn near-singular so the
    incremental Cholesky's l_ii hits its 1e-12 floor and f32 error in the
    maintained L^-1 can compound across appends.  The selections and the
    final posterior variance must still match the triangular-solve
    implementation (ADVICE round 2, gp/sampler.py:155)."""
    rng = np.random.default_rng(7)
    # three tight clusters (spacing ~1e-4, far below the kernel length
    # scale -> K rows nearly identical) + a handful of separated sites
    centers = np.array([[-0.5, -0.5], [0.4, 0.1], [0.0, 0.7]], np.float32)
    pts = [c + 1e-4 * rng.normal(size=(6, 2)) for c in centers]
    pts.append(rng.uniform(-1, 1, size=(10, 2)))
    x = np.concatenate(pts).astype(np.float32)
    D = x.shape[0]
    # identical wide kernels: maximally ill-conditioned cross-covariance
    e = np.tile(np.array([0.25, 0.25, 0.0], np.float32), (D, 1))
    S = 12
    res = sampler.greedy_entropy_sample(
        jnp.array(x), jnp.array(e), jnp.ones((D,), bool),
        jnp.zeros((S, 2)), jnp.zeros((S, 3)), jnp.zeros((S,), bool),
        jnp.zeros((S,)), signal_var=1.0, num_slots=S,
    )
    want, var_ref = greedy_with_trisolve(jnp.array(x), jnp.array(e), S)
    got = list(np.array(res.domain_inds))
    assert got == want
