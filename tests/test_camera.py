import jax
import jax.numpy as jnp
import numpy as np

from como_tpu.geometry import camera, lie, transforms

K = jnp.array([[260.0, 0.0, 127.5], [0.0, 260.0, 95.5], [0.0, 0.0, 1.0]])


def random_points(key, n=32):
    P = jax.random.normal(key, (1, n, 3))
    return P.at[..., 2].set(1.5 + jnp.abs(P[..., 2]))


def test_project_jacobian():
    P = random_points(jax.random.PRNGKey(0))
    p, dp_dP = camera.project(K, P)

    def f(pt):
        return camera.project(K, pt[None, None])[0][0, 0]

    J_auto = jax.vmap(jax.jacfwd(f))(P[0])
    np.testing.assert_allclose(np.array(dp_dP[0]), np.array(J_auto), rtol=1e-4, atol=1e-5)


def test_backproject_roundtrip_and_jacobian():
    P = random_points(jax.random.PRNGKey(1))
    p, _ = camera.project(K, P)
    z = P[..., 2:3]
    P2, dP_dz = camera.backproject(K, p, z)
    np.testing.assert_allclose(np.array(P), np.array(P2), rtol=1e-4, atol=1e-5)

    def f(zi, pi):
        return camera.backproject(K, pi[None, None], zi[None, None])[0][0, 0]

    J_auto = jax.vmap(jax.jacfwd(f))(z[0], p[0])
    np.testing.assert_allclose(np.array(dP_dz[0]), np.array(J_auto), rtol=1e-4, atol=1e-5)


def test_transform_project_consistency():
    key = jax.random.PRNGKey(2)
    P = random_points(key)
    T = lie.se3_exp(0.1 * jax.random.normal(jax.random.PRNGKey(3), (1, 6)))
    p1, z1 = camera.transform_project(K, T, P)
    Pj, _, _ = transforms.transform_points(T, P)
    p2, _ = camera.project(K, Pj)
    np.testing.assert_allclose(np.array(p1), np.array(p2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.array(z1[..., 0]), np.array(Pj[..., 2]), rtol=1e-5, atol=1e-5)


def test_transform_points_jacobians():
    key = jax.random.PRNGKey(4)
    P = random_points(key, n=8)
    T = lie.se3_exp(0.3 * jax.random.normal(jax.random.PRNGKey(5), (1, 6)))
    Pj, dPj_dT, dPj_dPi = transforms.transform_points(T, P)

    # dPj/dxi at xi=0 for right-composed update T exp(xi)... reference uses
    # world-side convention dPj/dT = [-R P^, R]; verify against finite
    # structure: Pj(xi) = T exp(xi) P.
    def f(xi, pt):
        Tp = (T @ lie.se3_exp(xi[None]))[0]
        return Tp[:3, :3] @ pt + Tp[:3, 3]

    xi0 = jnp.zeros(6)
    J_auto = jax.vmap(lambda pt: jax.jacfwd(f)(xi0, pt))(P[0])
    np.testing.assert_allclose(np.array(dPj_dT[0]), np.array(J_auto), rtol=1e-4, atol=1e-5)

    J_pt = jax.vmap(lambda pt: jax.jacfwd(lambda q: f(xi0, q))(pt))(P[0])
    np.testing.assert_allclose(
        np.broadcast_to(np.array(dPj_dPi[0]), J_pt.shape), np.array(J_pt), rtol=1e-4, atol=1e-5
    )


def test_resize_intrinsics():
    K2 = camera.resize_intrinsics(K, [0.5, 0.5])
    assert abs(K2[0, 0] - 130.0) < 1e-4
    assert abs(K2[1, 1] - 130.0) < 1e-4
