"""DepthCov prior backends: analytic structure-tensor prior + flax UNet."""

import jax
import jax.numpy as jnp
import numpy as np

from como_tpu.data.synthetic import PlaneScene
from como_tpu.net import analytic_prior, unet as unet_mod
from como_tpu.net.depthcov import DepthCovPrior, load_params, save_params


def test_analytic_prior_spd_and_structure():
    scene = PlaneScene(img_size=(48, 64), seed=0)
    rgb, _ = scene.render(jnp.eye(4))
    cov = np.array(analytic_prior.cov_params_from_rgb(rgb))
    assert cov.shape == (3, 48, 64)
    e00, e11, e01 = cov
    det = e00 * e11 - e01 * e01
    assert det.min() > 0, "covariances must stay SPD"
    assert np.all(e00 >= analytic_prior.COV_MIN - 1e-9)
    assert np.all(e00 <= analytic_prior.COV_MAX + 1e-9)


def test_cov_activation_bounds():
    x = jnp.array([[100.0, -100.0, 5.0], [0.0, 0.0, 0.0]])
    e = np.array(unet_mod.cov_activation(x))
    assert np.all(e[:, 0] <= 1e4 + 1) and np.all(e[:, 0] >= 1e-3 - 1e-9)
    det = e[:, 0] * e[:, 1] - e[:, 2] ** 2
    assert np.all(det > 0)


def test_unet_forward_shapes():
    model, params = unet_mod.init_unet(jax.random.PRNGKey(0), (64, 96))
    outs = model.apply(params, jnp.zeros((1, 64, 96, 3)))
    # one covariance head per decoder level (reference: 5 levels,
    # DepthCovModule.py out_feature_channels per level), finest last at
    # full resolution
    assert len(outs) == 5
    assert outs[-1].shape == (1, 64, 96, 3)
    assert outs[0].shape == (1, 4, 6, 3)
    fin = np.array(outs[-1])
    det = fin[..., 0] * fin[..., 1] - fin[..., 2] ** 2
    assert det.min() > 0


def test_depthcov_prior_both_modes(tmp_path):
    scene = PlaneScene(img_size=(48, 64), seed=1)
    rgb, _ = scene.render(jnp.eye(4))
    p_a = DepthCovPrior(mode="analytic")
    cov_a = p_a.cov_params(rgb)
    assert cov_a.shape == (3, 48, 64)

    p_u = DepthCovPrior(mode="unet")
    cov_u = p_u.cov_params(rgb)
    assert cov_u.shape == (3, 48, 64)
    assert np.all(np.isfinite(np.array(cov_u)))

    # params roundtrip
    path = str(tmp_path / "p.msgpack")
    save_params(p_u._params, path)
    loaded = load_params(path)
    chex_equal = jax.tree.map(lambda a, b: np.allclose(np.array(a), np.array(b)),
                              p_u._params, loaded)
    assert all(jax.tree.leaves(chex_equal))


def test_robust_weights():
    from como_tpu.odom.backend import robust

    r = jnp.array([0.0, 1.0, 2.0, 10.0])
    np.testing.assert_allclose(np.array(robust.squared(r)), 1.0)
    w = np.array(robust.huber(r))
    assert w[0] == 1.0 and w[1] == 1.0 and abs(w[3] - 1.345 / 10) < 1e-6
    wt = np.array(robust.tukey(r))
    assert wt[0] == 1.0 and wt[3] == 0.0 and 0 < wt[2] < 1
