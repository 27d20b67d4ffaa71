"""IC photometric tracking on the synthetic plane scene: track a frame
with known relative pose from a keyframe with ground-truth depth, and
require pose recovery to sub-millimeter / sub-milliradian accuracy."""

import jax.numpy as jnp
import numpy as np
import pytest

from como_tpu.config import TrackingConfig
from como_tpu.data.synthetic import PlaneScene
from como_tpu.geometry import lie
from como_tpu.odom import tracking as tr
from como_tpu.odom.frontend import tracking_kernels as tk

IMG = (96, 128)  # small for test speed


@pytest.fixture(scope="module")
def scene():
    return PlaneScene(img_size=IMG, seed=0)


def make_tracking(scene):
    cfg = TrackingConfig()
    t = tr.Tracking(cfg=cfg, intrinsics=scene.K, img_size=IMG)
    t.setup()
    return t


def test_track_known_motion(scene):
    t = make_tracking(scene)
    T_kf = jnp.eye(4)
    rgb0, depth0 = scene.render(T_kf)
    t.update_kf_reference(([0.0], rgb0, T_kf[None], jnp.zeros((1, 2)), depth0))
    assert t.mapping_init

    xi = jnp.array([0.01, -0.015, 0.008, 0.04, -0.02, 0.015])
    T_w_curr = lie.se3_exp(xi)          # ground-truth world pose of frame
    rgb1, _ = scene.render(T_w_curr)

    (ts, T_w_est), _ = t.handle_frame(1 / 30.0, rgb1)
    err = lie.se3_log(lie.invert_se3(T_w_est) @ T_w_curr)
    rot_err = float(jnp.linalg.norm(err[:3]))
    trans_err = float(jnp.linalg.norm(err[3:]))
    assert rot_err < 2e-3, rot_err
    assert trans_err < 2e-3, trans_err


def test_track_sequence_accumulates(scene):
    """Track 5 consecutive frames against one KF; drift must stay small."""
    t = make_tracking(scene)
    T_kf = jnp.eye(4)
    rgb0, depth0 = scene.render(T_kf)
    t.update_kf_reference(([0.0], rgb0, T_kf[None], jnp.zeros((1, 2)), depth0))

    rng = np.random.default_rng(0)
    T_true = jnp.eye(4)
    for i in range(5):
        xi = jnp.array(np.concatenate([
            0.004 * rng.normal(size=3), 0.012 * rng.normal(size=3) + [0.01, 0, 0]
        ]), dtype=jnp.float32)
        T_true = T_true @ lie.se3_exp(xi)
        rgb_i, _ = scene.render(T_true)
        (_, T_w_est), _ = t.handle_frame((i + 1) / 30.0, rgb_i)
    err = lie.se3_log(lie.invert_se3(T_w_est) @ T_true)
    assert float(jnp.linalg.norm(err)) < 5e-3


def test_affine_brightness_recovery(scene):
    """Apply a gain/bias to the target frame; tracking must still converge
    and absorb it in the affine parameters."""
    t = make_tracking(scene)
    T_kf = jnp.eye(4)
    rgb0, depth0 = scene.render(T_kf)
    t.update_kf_reference(([0.0], rgb0, T_kf[None], jnp.zeros((1, 2)), depth0))

    xi = jnp.array([0.0, 0.0, 0.0, 0.02, 0.0, 0.0])
    T_w_curr = lie.se3_exp(xi)
    rgb1, _ = scene.render(T_w_curr)
    rgb1 = jnp.clip(1.15 * rgb1 + 0.03, 0.0, 1.0)

    (_, T_w_est), _ = t.handle_frame(1 / 30.0, rgb1)
    err = lie.se3_log(lie.invert_se3(T_w_est) @ T_w_curr)
    assert float(jnp.linalg.norm(err)) < 4e-3
    # gain 1.15 -> a ~ +log(1.15) with I_corr = exp(-a) I_t + b
    a = float(t.aff_curr_kf[0])
    assert abs(a - np.log(1.15)) < 0.05


def test_keyframe_decision_on_large_motion(scene):
    t = make_tracking(scene)
    T_kf = jnp.eye(4)
    rgb0, depth0 = scene.render(T_kf)
    t.update_kf_reference(([0.0], rgb0, T_kf[None], jnp.zeros((1, 2)), depth0))

    # big translation: ~0.3 of median depth (2m) -> keyframe
    T_w_curr = lie.se3_exp(jnp.array([0.0, 0.0, 0.0, 0.55, 0.0, 0.0]))
    rgb1, _ = scene.render(T_w_curr)
    _, track_map = t.handle_frame(1 / 30.0, rgb1)
    assert track_map is not None and track_map[0] == "keyframe"


def _decision_pending(t, *, kf_dist=0.0, rot_angle=0.0, median_depth=2.0,
                      num_reproj=100, num_kf_pixels=100, ts=1 / 30.0):
    """A hand-built dispatch record so decide() can be unit-tested
    without rendering (stats layout: tracking.py dispatch_frame)."""
    return dict(ts=ts, rgb=None, Tji=jnp.eye(4), aff=jnp.zeros((2,)),
                T_w_curr=jnp.eye(4),
                stats=jnp.array([num_reproj, median_depth, kf_dist,
                                 rot_angle], dtype=jnp.float32),
                kf_received_ts=t.kf_received_ts,
                num_kf_pixels=num_kf_pixels)


def test_rotation_aware_keyframe_trigger(scene):
    """kf_rot_weight folds depth*rot_angle into the motion criterion: a
    pure rotation that sweeps points by ~depth*theta must promote a
    keyframe when the weight is on, and must NOT under the reference's
    translation-only rule (como/odom/Tracking.py:114-132 has no rotation
    term — the clutter-orbit drift sweep showed that rule fires
    chaotically on rotation-dominant paths)."""
    t = make_tracking(scene)
    T_kf = jnp.eye(4)
    rgb0, depth0 = scene.render(T_kf)
    t.update_kf_reference(([0.0], rgb0, T_kf[None], jnp.zeros((1, 2)), depth0))

    # pure rotation: kf_dist=0, theta=0.2 rad, depth 2 m
    # -> effective dist 0.5*2*0.2 = 0.2 > 0.12*2 = 0.24?  no: 0.2 < 0.24
    # use theta=0.3: 0.5*2*0.3 = 0.3 > 0.24 -> keyframe
    t.cfg.keyframing.kf_rot_weight = 0.0
    out = t.decide(_decision_pending(t, rot_angle=0.3))
    assert out is None or out[0] != "keyframe"

    t2 = make_tracking(scene)
    t2.update_kf_reference(([0.0], rgb0, T_kf[None], jnp.zeros((1, 2)), depth0))
    t2.cfg.keyframing.kf_rot_weight = 0.5
    out = t2.decide(_decision_pending(t2, rot_angle=0.3))
    assert out is not None and out[0] == "keyframe"
    # sub-threshold rotation stays quiet with the weight on
    t3 = make_tracking(scene)
    t3.update_kf_reference(([0.0], rgb0, T_kf[None], jnp.zeros((1, 2)), depth0))
    t3.cfg.keyframing.kf_rot_weight = 0.5
    out = t3.decide(_decision_pending(t3, rot_angle=0.05))
    assert out is None or out[0] != "keyframe"


def test_rot_mode_max_ignores_subdominant_rotation(scene):
    """kf_rot_mode="max" (the default): the rotation term drives the
    trigger only when it DOMINATES the viewpoint change.  A translation
    just under threshold plus a small rotation must NOT trigger (sum-mode
    folding would: 0.20 + 0.5*2*0.08 = 0.28 > 0.24) — sum-folding was
    measured to perturb keyframe timing on translation-dominant worlds
    (+5 cm on the bench world's worst seed) because every small rotation
    nudged the trigger earlier."""
    t = make_tracking(scene)
    T_kf = jnp.eye(4)
    rgb0, depth0 = scene.render(T_kf)
    t.update_kf_reference(([0.0], rgb0, T_kf[None], jnp.zeros((1, 2)), depth0))
    t.cfg.keyframing.kf_rot_weight = 0.5
    t.cfg.keyframing.kf_rot_mode = "max"
    out = t.decide(_decision_pending(t, kf_dist=0.20, rot_angle=0.08))
    assert out is None or out[0] != "keyframe"
    # same stats, sum mode: triggers (the old folding behavior)
    t2 = make_tracking(scene)
    t2.update_kf_reference(([0.0], rgb0, T_kf[None], jnp.zeros((1, 2)), depth0))
    t2.cfg.keyframing.kf_rot_weight = 0.5
    t2.cfg.keyframing.kf_rot_mode = "sum"
    out = t2.decide(_decision_pending(t2, kf_dist=0.20, rot_angle=0.08))
    assert out is not None and out[0] == "keyframe"
    # dominant rotation still triggers under max
    t3 = make_tracking(scene)
    t3.update_kf_reference(([0.0], rgb0, T_kf[None], jnp.zeros((1, 2)), depth0))
    t3.cfg.keyframing.kf_rot_weight = 0.5
    t3.cfg.keyframing.kf_rot_mode = "max"
    out = t3.decide(_decision_pending(t3, kf_dist=0.0, rot_angle=0.3))
    assert out is not None and out[0] == "keyframe"


def test_anticipate_auto_resolves_from_dispatch_lag(scene):
    """kf_anticipate=-1 (the default) resolves to the runtime's dispatch
    lag when it is short (<= 2 frames) and to OFF at deep lag: rate
    extrapolation is only trustworthy over a short horizon (ant=2 at
    dispatch depth 6 measurably regressed a bench seed, NOTES_ROUND5)."""

    def tracker(lag):
        cfg = TrackingConfig()
        assert cfg.keyframing.kf_anticipate == -1  # auto is the default
        t = tr.Tracking(cfg=cfg, intrinsics=scene.K, img_size=IMG,
                        decision_lag=lag)
        t.setup()
        T_kf = jnp.eye(4)
        rgb0, depth0 = scene.render(T_kf)
        t.update_kf_reference(
            ([0.0], rgb0, T_kf[None], jnp.zeros((1, 2)), depth0))
        return t

    # motion growing 0.10 -> 0.16 per decide at threshold 0.12*2.0=0.24:
    # at lag 2 the auto rule extrapolates 0.16 + 2*0.06 = 0.28 > 0.24
    # -> the head will have crossed by insertion time: trigger now
    t = tracker(2)
    t.decide(_decision_pending(t, kf_dist=0.10))
    out = t.decide(_decision_pending(t, kf_dist=0.16, ts=2 / 30.0))
    assert out is not None and out[0] == "keyframe"
    # same stats at lag 6: auto disables anticipation (0.16 < 0.24)
    t6 = tracker(6)
    t6.decide(_decision_pending(t6, kf_dist=0.10))
    out = t6.decide(_decision_pending(t6, kf_dist=0.16, ts=2 / 30.0))
    assert out is None or out[0] != "keyframe"


def test_stat_ema_smooths_median_depth(scene):
    """stat_ema damps single-frame median-depth flicker: a one-frame
    depth spike that would trip the motion threshold at raw stats must
    not trip it through the EMA."""
    t = make_tracking(scene)
    T_kf = jnp.eye(4)
    rgb0, depth0 = scene.render(T_kf)
    t.update_kf_reference(([0.0], rgb0, T_kf[None], jnp.zeros((1, 2)), depth0))
    t.cfg.keyframing.stat_ema = 0.9
    # seed the EMA at depth 2.0 (kf threshold 0.24)
    t.decide(_decision_pending(t, median_depth=2.0, kf_dist=0.0))
    # spike: median collapses to 0.5 (raw threshold 0.06 < dist 0.1)
    out = t.decide(_decision_pending(t, median_depth=0.5, kf_dist=0.1,
                                     ts=2 / 30.0))
    # EMA depth = 0.9*2.0 + 0.1*0.5 = 1.85 -> threshold 0.222 > 0.1
    assert out is None or out[0] != "keyframe"


def test_lost_frame_holds_pose(scene):
    """Non-finite tracking stats (degenerate view / poisoned reference)
    must mark the frame lost, restore the last finite relative pose, and
    hand the runtime a None pose to hold — never a NaN (regression: a
    400-frame plane walk drove depth -> 0 and NaN poses reached the
    trajectory)."""
    t = make_tracking(scene)
    T_kf = jnp.eye(4)
    rgb0, depth0 = scene.render(T_kf)
    t.update_kf_reference(([0.0], rgb0, T_kf[None], jnp.zeros((1, 2)), depth0))
    rgb1, _ = scene.render(lie.se3_exp(jnp.array([0, 0, 0, 0.02, 0.0, 0.0])))
    (_, T1), _ = t.handle_frame(1 / 30.0, rgb1)
    assert T1 is not None and bool(jnp.all(jnp.isfinite(T1)))
    good_T, good_aff = t._last_good

    poisoned = dict(ts=2 / 30.0, rgb=rgb1, Tji=jnp.full((4, 4), jnp.nan),
                    aff=jnp.zeros((2,)), T_w_curr=jnp.full((4, 4), jnp.nan),
                    stats=jnp.array([jnp.nan, jnp.nan, jnp.nan, jnp.nan]),
                    kf_received_ts=t.kf_received_ts, num_kf_pixels=100)
    t.T_curr_kf = jnp.full((4, 4), jnp.nan)
    out = t.decide(poisoned)
    assert out is None and poisoned.get("lost") is True
    assert t.T_curr_kf is good_T and t.aff_curr_kf is good_aff
    # next frame re-locks from the restored pose and stays finite
    (_, T2), _ = t.handle_frame(3 / 30.0, rgb1)
    assert T2 is not None and bool(jnp.all(jnp.isfinite(T2)))
