"""Multi-keyframe tracking reference (reference track_ref.num_keyframes):
points from several keyframes merged into the last KF's frame."""

import jax.numpy as jnp
import numpy as np

from como_tpu.data.synthetic import PlaneScene
from como_tpu.geometry import lie
from como_tpu.odom import tracking as tr
from como_tpu.config import TrackingConfig

IMG = (48, 64)


def test_build_reference_two_keyframes():
    scene = PlaneScene(img_size=IMG, seed=0)
    T0 = jnp.eye(4)
    T1 = lie.se3_exp(jnp.array([0.0, 0.0, 0.0, 0.05, 0.0, 0.0]))
    rgb0, d0 = scene.render(T0)
    rgb1, d1 = scene.render(T1)
    rgb = jnp.concatenate([rgb0, rgb1], 0)
    depth = jnp.concatenate([d0, d1], 0)
    poses = jnp.stack([T0, T1])

    levels = tr.build_reference(rgb, poses, depth, scene.K, 0, 3,
                                "nearest_neighbor")
    N = IMG[0] * IMG[1]
    fin = levels[-1]
    assert fin.P.shape == (2 * N, 3)
    # KF0's points expressed in KF1's frame must lie on the plane when
    # transformed back to the world through T1
    P0_in_1 = np.array(fin.P[:N])
    Pw = P0_in_1 @ np.array(T1[:3, :3]).T + np.array(T1[:3, 3])
    resid = Pw @ np.array(scene.normal) - float(scene.d0)
    m = np.array(fin.mask[:N])
    assert np.abs(resid[m]).max() < 1e-2
    # KF1's own points are untransformed
    P1 = np.array(fin.P[N:])
    Pw1 = P1 @ np.array(T1[:3, :3]).T + np.array(T1[:3, 3])
    resid1 = Pw1 @ np.array(scene.normal) - float(scene.d0)
    assert np.abs(resid1[np.array(fin.mask[N:])]).max() < 1e-2


def test_track_against_merged_reference():
    scene = PlaneScene(img_size=IMG, seed=0)
    cfg = TrackingConfig()
    t = tr.Tracking(cfg=cfg, intrinsics=scene.K, img_size=IMG)
    t.setup()
    T0 = jnp.eye(4)
    T1 = lie.se3_exp(jnp.array([0.0, 0.0, 0.0, 0.05, 0.0, 0.0]))
    rgb0, d0 = scene.render(T0)
    rgb1, d1 = scene.render(T1)
    t.update_kf_reference(([0.0, 0.1],
                           jnp.concatenate([rgb0, rgb1], 0),
                           jnp.stack([T0, T1]),
                           jnp.zeros((2, 2)),
                           jnp.concatenate([d0, d1], 0)))
    T_true = lie.se3_exp(jnp.array([0.004, -0.002, 0.003, 0.07, 0.01, 0.0]))
    rgb2, _ = scene.render(T_true)
    (_, T_est), _ = t.handle_frame(0.2, rgb2)
    err = lie.se3_log((lie.invert_se3(T_est) @ T_true)[None])
    assert float(jnp.linalg.norm(err)) < 5e-3
