import jax.numpy as jnp
import numpy as np

from como_tpu.gp import kernels, predictor, distill


def make_sites(rng, n):
    x = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    e = np.abs(rng.normal(size=(n, 3)).astype(np.float32)) * 0.2 + 0.1
    e[:, 2] = 0.0  # diagonal covs keep things well conditioned
    return jnp.array(x), jnp.array(e)


def test_predictor_interpolates_anchors():
    """GP conditional mean must reproduce anchor values at anchor sites."""
    rng = np.random.default_rng(0)
    x_m, e_m = make_sites(rng, 16)
    scale = 1.0
    K_mm, K_nm, _ = predictor.kernel_matrices(x_m, e_m, x_m, e_m, scale)
    pred = predictor.build_predictor(K_mm, K_nm, jitter=1e-6)
    logz_m = jnp.array(rng.normal(size=(16,)).astype(np.float32))
    pred_vals = np.array(pred.Knm_Kmminv @ logz_m)
    np.testing.assert_allclose(pred_vals, np.array(logz_m), atol=5e-3)


def test_predictive_stdev_small_at_anchors():
    rng = np.random.default_rng(1)
    x_m, e_m = make_sites(rng, 8)
    x_n = jnp.concatenate([x_m, jnp.array([[0.99, 0.99]], jnp.float32)], axis=0)
    e_n = jnp.concatenate([e_m, jnp.array([[0.1, 0.1, 0.0]], jnp.float32)], axis=0)
    K_mm, K_nm, K_nn_diag = predictor.kernel_matrices(x_m, e_m, x_n, e_n, 1.0)
    pred = predictor.build_predictor(K_mm, K_nm)
    si = np.array(predictor.predictive_stdev_inv(K_nm, pred.Knm_Kmminv, K_nn_diag))
    # anchors have (near-)zero posterior stdev -> huge stdev_inv vs far site
    assert si[:8].min() > 5 * si[8]


def test_distill_recovers_depths():
    """If observations are GP-predicted from some anchor depths, distill
    must recover those anchor depths."""
    rng = np.random.default_rng(2)
    x_m, e_m = make_sites(rng, 12)
    x_n, e_n = make_sites(rng, 200)
    K_mm, K_nm, K_nn_diag = predictor.kernel_matrices(x_m, e_m, x_n, e_n, 1.0)
    pred = predictor.build_predictor(K_mm, K_nm)
    logz_true = jnp.array(rng.normal(size=(12,)).astype(np.float32) * 0.3)
    logz_obs = pred.Knm_Kmminv @ logz_true
    mask = jnp.ones((200,), bool)

    logz_m, resid = distill.distill_depth(pred.Knm_Kmminv, logz_obs, mask,
                                          with_prior=False)
    np.testing.assert_allclose(np.array(logz_m), np.array(logz_true), atol=2e-2)
    assert float(jnp.max(jnp.abs(resid))) < 2e-2

    # with-prior variant shrinks but stays close
    si = predictor.predictive_stdev_inv(K_nm, pred.Knm_Kmminv, K_nn_diag)
    logz_mp, _ = distill.distill_depth(pred.Knm_Kmminv, logz_obs, mask,
                                       with_prior=True, L_mm=pred.L_mm,
                                       stdev_inv_obs=si)
    assert float(jnp.mean(jnp.abs(logz_mp - logz_true))) < 0.2


def test_distill_masked_rows_ignored():
    rng = np.random.default_rng(3)
    x_m, e_m = make_sites(rng, 6)
    x_n, e_n = make_sites(rng, 100)
    K_mm, K_nm, _ = predictor.kernel_matrices(x_m, e_m, x_n, e_n, 1.0)
    pred = predictor.build_predictor(K_mm, K_nm)
    logz_true = jnp.array(rng.normal(size=(6,)).astype(np.float32) * 0.3)
    logz_obs = pred.Knm_Kmminv @ logz_true
    # corrupt half of the observations but mask them out
    corrupted = logz_obs.at[50:].set(100.0)
    mask = jnp.arange(100) < 50
    logz_m, _ = distill.distill_depth(pred.Knm_Kmminv, corrupted, mask, with_prior=False)
    np.testing.assert_allclose(np.array(logz_m), np.array(logz_true), atol=5e-2)


def test_distill_conditional():
    """New anchors conditioned on tracked ones + median prior."""
    rng = np.random.default_rng(4)
    m, n = 10, 300
    x_m, e_m = make_sites(rng, m)
    x_n, e_n = make_sites(rng, n)
    K_mm, K_nm, _ = predictor.kernel_matrices(x_m, e_m, x_n, e_n, 1.0)
    pred = predictor.build_predictor(K_mm, K_nm)
    logz_true = jnp.array(rng.normal(size=(m,)).astype(np.float32) * 0.2 + 0.5)
    logz_obs = pred.Knm_Kmminv @ logz_true
    m1_mask = jnp.arange(m) < 4   # first 4 tracked
    logz1 = jnp.where(m1_mask, logz_true, 0.0)
    si = jnp.full((n,), 10.0)
    logz2 = distill.distill_conditional_depth(
        pred.Knm_Kmminv, logz_obs, jnp.ones((n,), bool), logz1, m1_mask, si
    )
    got = np.array(logz2)[4:]
    want = np.array(logz_true)[4:]
    np.testing.assert_allclose(got, want, atol=0.08)
    np.testing.assert_allclose(np.array(logz2)[:4], 0.0, atol=1e-6)
