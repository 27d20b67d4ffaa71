"""RGB (3-channel) photometric tracking (reference tracking.color: rgb):
per-channel residuals via channel-major sample rows."""

import jax.numpy as jnp
import numpy as np

from como_tpu.config import TrackingConfig
from como_tpu.data.synthetic import PlaneScene
from como_tpu.geometry import lie
from como_tpu.odom import tracking as tr

IMG = (48, 64)


def make_scene_rgb():
    """Distinct per-channel textures so color actually adds information."""
    s = PlaneScene(img_size=IMG, seed=0)
    s2 = PlaneScene(img_size=IMG, seed=7)
    s3 = PlaneScene(img_size=IMG, seed=13)

    def render(T):
        r, d = s.render(T)
        g, _ = s2.render(T)
        b, _ = s3.render(T)
        rgb = jnp.concatenate([r[:, :1], g[:, :1], b[:, :1]], axis=1)
        return rgb, d

    return s, render


def test_rgb_tracking_recovers_pose():
    scene, render = make_scene_rgb()
    cfg = TrackingConfig()
    cfg.color = "rgb"
    t = tr.Tracking(cfg=cfg, intrinsics=scene.K, img_size=IMG)
    t.setup()
    rgb0, depth0 = render(jnp.eye(4))
    t.update_kf_reference(([0.0], rgb0, jnp.eye(4)[None],
                           jnp.zeros((1, 2)), depth0))
    xi = jnp.array([0.008, -0.01, 0.006, 0.03, -0.015, 0.01])
    T_true = lie.se3_exp(xi)
    rgb1, _ = render(T_true)
    (_, T_est), track_map = t.handle_frame(1 / 30.0, rgb1)
    err = lie.se3_log((lie.invert_se3(T_est) @ T_true)[None])
    assert float(jnp.linalg.norm(err)) < 3e-3
    # reference arrays carry 3x the samples
    assert t.levels[-1].vals.shape[0] == 3 * IMG[0] * IMG[1]


def test_gray_unchanged():
    scene, render = make_scene_rgb()
    cfg = TrackingConfig()  # gray default
    t = tr.Tracking(cfg=cfg, intrinsics=scene.K, img_size=IMG)
    t.setup()
    rgb0, depth0 = render(jnp.eye(4))
    t.update_kf_reference(([0.0], rgb0, jnp.eye(4)[None],
                           jnp.zeros((1, 2)), depth0))
    assert t.levels[-1].vals.shape[0] == IMG[0] * IMG[1]
