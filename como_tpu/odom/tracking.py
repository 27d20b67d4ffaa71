"""Tracking frontend state machine.

Spec: reference como/odom/Tracking.py — per-frame 6-DoF + affine tracking
against the latest keyframe reference, with keyframe / one-way-frame
decisions.  Host code here only orchestrates; every tensor op is jitted:
  * build_reference: pyramids, per-level sample values, 3D points, IC
    Jacobians (reference update_kf_reference:191-314),
  * track_pyramid: the on-device coarse-to-fine IC solve,
  * reproj_stats: coverage + median depth of the KF cloud in the current
    frame (reference get_reproj_last_kf:169-188) for frame decisions.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from como_tpu.config import TrackingConfig
from como_tpu.geometry import affine, lie, transforms
from como_tpu.geometry.camera import backproject, project
from como_tpu.ops import image as img_ops
from como_tpu.ops.coords import coord_grid_rc, fill_image
from como_tpu.ops.reduce import histogram_median
from como_tpu.odom.frontend import tracking_kernels as tk


@partial(jax.jit, static_argnames=("start_level", "end_level", "depth_mode",
                                   "color"))
def build_reference(kf_rgb, kf_poses, depth, K, start_level: int, end_level: int,
                    depth_mode: str, color: str = "gray"):
    """Build per-level TrackLevel reference data from KF data (B keyframes;
    points from all B transformed into the last KF's frame, as in the
    reference's multi-KF merge; B=1 is the default config).

    color="rgb" tracks all 3 channels (reference tracking.color): each
    channel becomes its own flattened sample row (channel-major) sharing
    the 3D point but carrying its own intensity + IC Jacobian, so the
    solver is channel-agnostic."""
    B = kf_rgb.shape[0]
    img = img_ops.rgb_to_gray(kf_rgb) if color == "gray" else kf_rgb
    C = img.shape[1]
    img_pyr = img_ops.image_pyramid(img, start_level, end_level)
    depth_pyr = img_ops.depth_pyramid(depth, start_level, end_level, depth_mode)
    K_pyr = img_ops.intrinsics_pyramid(K, start_level, end_level)

    T_last = kf_poses[-1]
    rel = lie.invert_se3(T_last)[None] @ kf_poses  # (B, 4, 4) to-last transforms

    levels = []
    for img_l, depth_l, K_l in zip(img_pyr, depth_pyr, K_pyr):
        h, w = img_l.shape[-2:]
        gx, gy = img_ops.image_gradients(img_l)
        rc = coord_grid_rc((h, w), dtype=img_l.dtype)        # (N, 2)
        xy = jnp.stack([rc[:, 1], rc[:, 0]], axis=-1)
        z = depth_l.reshape(B, -1)[..., None]                # (B, N, 1)
        P, _ = backproject(K_l, xy[None], z)                 # (B, N, 3)
        P_last, _, _ = transforms.transform_points(rel, P)
        # validity: projects near the last KF's frustum, depth positive
        p_all, _ = project(K_l, P_last)
        border = 50.0
        mask = ((p_all[..., 0] >= -border) & (p_all[..., 0] <= w - 1 + border)
                & (p_all[..., 1] >= -border) & (p_all[..., 1] <= h - 1 + border)
                & (P_last[..., 2] > 1e-4))
        # channel-major flattening: sample row (c, b, n) shares P[b, n] so
        # the solver can slice channels contiguously when sampling the
        # target image
        vals = img_l.reshape(B, C, -1).transpose(1, 0, 2)    # (C, B, N)
        grads = jnp.stack([gx.reshape(B, C, -1),
                           gy.reshape(B, C, -1)], axis=-1).transpose(1, 0, 2, 3)
        P_rep = jnp.broadcast_to(P_last[None], (C, B) + P_last.shape[1:])
        mask_rep = jnp.broadcast_to(mask[None], (C, B) + mask.shape[1:])
        J = jax.vmap(tk.precalc_ic_jacobians, in_axes=(0, 0, None))(
            grads.reshape(C * B, -1, 2), P_rep.reshape(C * B, -1, 3), K_l)
        levels.append(tk.TrackLevel(
            vals=vals.reshape(-1), P=P_rep.reshape(-1, 3), J_ic=J.reshape(-1, 8),
            mask=mask_rep.reshape(-1), K=K_l,
        ))
    return levels


@partial(jax.jit, static_argnames=("img_hw",))
def frame_stats(P_full, mask_full, T_curr_kf, T_w_kf, K, img_hw):
    """One fused per-frame device call: current world pose + the four
    decision scalars (coverage count, median reprojected depth, |t|,
    rotation angle w.r.t. the KF)
    (reference get_reproj_last_kf + handle_frame:342-345; the rotation
    term extends the reference's translation-only motion criterion for
    rotation-dominant viewpoint change — orbits — where |t| alone makes
    keyframe timing chaotic).  Returns (T_w_curr (4,4), stats (4,)) so
    the host pulls a single bundle."""
    P_curr, _, _ = transforms.transform_points(T_curr_kf[None], P_full[None])
    p, _ = project(K, P_curr)
    z = P_curr[0, :, 2]
    h, w = img_hw
    x, y = p[0, :, 0], p[0, :, 1]
    valid = ((x > 0) & (x < w - 1) & (y > 0) & (y < h - 1) & (z > 0.0) & mask_full)
    coords_rc = jnp.stack([y, x], axis=-1)
    safe_rc = jnp.where(valid[:, None], coords_rc, -1.0)
    depth_img = fill_image(safe_rc, z, (h, w), default_val=jnp.nan)
    filled = jnp.logical_not(jnp.isnan(depth_img))
    count = jnp.sum(filled).astype(jnp.float32)
    med = histogram_median(jnp.where(filled, depth_img, 0.0), filled)
    T_w_curr = transforms.get_T_w_curr(T_w_kf[None], T_curr_kf[None])[0]
    kf_dist = jnp.linalg.norm(T_curr_kf[:3, 3])
    # geodesic rotation angle of the frame-from-KF pose (radians)
    cos_th = 0.5 * (jnp.trace(T_curr_kf[:3, :3]) - 1.0)
    rot = jnp.arccos(jnp.clip(cos_th, -1.0, 1.0))
    return T_w_curr, jnp.stack([count, med, kf_dist, rot])


@partial(jax.jit, static_argnames=("term", "start_level", "end_level",
                                   "img_hw", "color"))
def track_frame_fused(levels, rgb, T_init, aff_init, T_w_kf, term,
                      start_level: int, end_level: int, img_hw,
                      color: str = "gray"):
    """Whole per-frame tracking as ONE device program: (grayscale) ->
    pyramid -> coarse-to-fine IC solve -> world pose + decision stats.
    (One dispatch per frame; programs pipeline on remote-attached TPUs.)"""
    img = img_ops.rgb_to_gray(rgb) if color == "gray" else rgb
    C = img.shape[1]
    img_pyr = img_ops.image_pyramid(img, start_level, end_level)
    Tji, aff, _ = tk.track_pyramid(levels, img_pyr, T_init, aff_init, term)
    finest = levels[-1]
    npix = finest.vals.shape[0] // C  # decision stats over channel-0 rows
    T_w_curr, stats = frame_stats(finest.P[:npix], finest.mask[:npix], Tji,
                                  T_w_kf, finest.K, img_hw)
    return Tji, aff, T_w_curr, stats


@jax.jit
def predict_const_velocity(T_prev, T_curr):
    """Warm start T_next ~ T_curr (T_prev^-1 T_curr): replay the last
    relative motion (both poses are frame-from-KF)."""
    return T_curr @ (lie.invert_se3(T_prev) @ T_curr)


@jax.jit
def rebase_to_new_kf(T_w_kf_old, T_curr_kf, aff_w_kf_old, aff_curr_kf,
                     new_pose, new_aff):
    """Re-express current-frame-relative pose/affine against a new KF.

    Non-finite inputs (a diverged dispatched-but-undecided frame) are
    sanitized to identity ON DEVICE: checking finiteness on the host
    would block on the whole dispatch queue — measured 42 ms median per
    reference refresh on the remote-attached chip."""
    T_w_f = transforms.get_T_w_curr(T_w_kf_old[None], T_curr_kf[None])[0]
    T_rel = transforms.get_rel_pose(T_w_f, new_pose)
    aff_w_f = affine.get_aff_w_curr(aff_w_kf_old[None, :, None],
                                    aff_curr_kf[None, :, None])
    aff_rel = affine.get_rel_aff(aff_w_f, new_aff[None, :, None])[0, :, 0]
    ok = jnp.all(jnp.isfinite(T_rel)) & jnp.all(jnp.isfinite(aff_rel))
    T_rel = jnp.where(ok, T_rel, jnp.eye(4, dtype=T_rel.dtype))
    aff_rel = jnp.where(ok, aff_rel, jnp.zeros_like(aff_rel))
    return T_rel, aff_rel


@dataclass
class Tracking:
    """Per-frame tracking state machine (host-side orchestration)."""
    cfg: TrackingConfig
    intrinsics: jax.Array
    img_size: tuple
    # dispatch depth of the enclosing runtime: decisions resolve this many
    # frames after dispatch.  Used to resolve kf_anticipate=-1 (auto).
    decision_lag: int = 0

    mapping_init: bool = False
    # constant-velocity warm start: helps on smooth trajectories, hurts on
    # jerky ones — opt-in (cfg.use_motion_model)
    use_motion_model: bool = False
    levels: Optional[List] = None
    T_curr_kf: Optional[jax.Array] = None
    aff_curr_kf: Optional[jax.Array] = None
    _T_prev: Optional[jax.Array] = None
    T_w_kf: Optional[jax.Array] = None
    aff_w_kf: Optional[jax.Array] = None
    kf_received_ts: float = -1.0
    last_kf_sent_ts: float = -1.0
    num_one_way_since_kf: int = 0
    _last_good: Optional[tuple] = None  # (Tji, aff) of last finite decide
    _med_ema: Optional[float] = None    # EMA of decision median depth
    _prev_motion: Optional[float] = None  # last decide's kf_dist (anticipate)

    def setup(self):
        self.use_motion_model = getattr(self.cfg, "use_motion_model", False)
        # f64 is rejected at config.validate (TPU f32 redesign)
        self.dtype = {"float32": jnp.float32}[self.cfg.dtype]
        self.term = tk.TermStatic(
            max_iter=self.cfg.term_criteria.max_iter,
            delta_norm=self.cfg.term_criteria.delta_norm,
            rel_tol=self.cfg.term_criteria.rel_tol,
            grad_norm=self.cfg.term_criteria.grad_norm,
            abs_tol=self.cfg.term_criteria.abs_tol,
            estimate_affine=self.cfg.estimate_affine,
        )
        self._reset_rel_vars()

    def _reset_rel_vars(self):
        self.T_curr_kf = jnp.eye(4, dtype=self.dtype)
        self.aff_curr_kf = jnp.zeros((2,), self.dtype)

    # -- keyframe reference ------------------------------------------------
    def update_kf_reference(self, kf_data):
        """kf_data = (timestamps, rgb (B,3,H,W), pose (B,4,4), aff (B,2),
        depth (B,1,H,W)) — latest last (reference update_kf_reference)."""
        timestamps, rgb, pose, aff, depth = kf_data
        new_ts = float(timestamps[-1])
        rebased = new_ts > self.kf_received_ts and self.mapping_init

        if rebased:
            # rebase current-frame-relative pose/affine onto the new KF
            self.T_curr_kf, self.aff_curr_kf = rebase_to_new_kf(
                self.T_w_kf, self.T_curr_kf, self.aff_w_kf, self.aff_curr_kf,
                pose[-1], aff[-1])
            self.num_one_way_since_kf = 0
            self._T_prev = None  # motion model invalid across KF rebases
            self._med_ema = None  # median is w.r.t. the new reference now
            self._prev_motion = None  # motion is w.r.t. the new KF now
        elif not self.mapping_init:
            self.mapping_init = True
            self.last_kf_sent_ts = new_ts

        self.levels = build_reference(
            rgb, pose, depth, self.intrinsics,
            self.cfg.pyr.start_level, self.cfg.pyr.end_level,
            self.cfg.pyr.depth_interp_mode, self.cfg.color,
        )
        self.kf_received_ts = new_ts
        self.T_w_kf = pose[-1]
        self.aff_w_kf = aff[-1]
        # _last_good was expressed w.r.t. the previous KF; after a rebase
        # it is stale in the wrong frame for re-lock.  Re-seed it from the
        # rebased estimate (rebase_to_new_kf sanitizes non-finite inputs
        # to identity on device — no host sync here; decide()'s lost
        # branch re-validates finiteness before restoring).  On a pure
        # period refresh (same KF) the old seed is still valid AND known
        # finite — keep it rather than overwrite it with a possibly
        # diverged in-flight estimate (ADVICE r3).
        if rebased or self._last_good is None:
            self._last_good = (self.T_curr_kf, self.aff_curr_kf)

    # -- per-frame, async split ----------------------------------------------
    # On a remote-attached TPU every host<->device sync stalls the dispatch
    # pipeline (~30 ms/program overhead hides only when programs queue
    # back-to-back).  dispatch_frame() enqueues the track solve + decision
    # stats and returns device handles; decide() pulls the (by then
    # complete) stats and runs the keyframe/one-way logic — typically
    # called one frame later by the engine, keeping the queue full.
    @staticmethod
    def prefetch_decision(pending: dict) -> dict:
        """Enqueue async device->host copies of the arrays `decide` reads.

        The per-frame loop's floor is one blocking host sync per frame
        (np.asarray(stats) in decide = a full round trip on a
        remote-attached TPU, measured ~39 ms of a 41 ms median frame).
        Starting the D2H copy at dispatch time overlaps the transfer with
        the next frame's work, so decide finds the bytes already on host.
        """
        for key in ("stats", "T_w_curr"):
            arr = pending.get(key)
            if hasattr(arr, "copy_to_host_async"):
                arr.copy_to_host_async()
        return pending

    def dispatch_frame(self, timestamp: float, rgb: jax.Array):
        T_init = self.T_curr_kf
        if self.use_motion_model and self._T_prev is not None:
            T_init = predict_const_velocity(self._T_prev, self.T_curr_kf)
        T_before = self.T_curr_kf
        Tji, aff, T_w_curr, stats = track_frame_fused(
            self.levels, rgb, T_init, self.aff_curr_kf, self.T_w_kf,
            self.term, self.cfg.pyr.start_level, self.cfg.pyr.end_level,
            tuple(self.img_size), self.cfg.color)
        self._T_prev = T_before
        self.T_curr_kf, self.aff_curr_kf = Tji, aff
        C = 3 if self.cfg.color == "rgb" else 1
        return self.prefetch_decision(dict(
            ts=timestamp, rgb=rgb, Tji=Tji, aff=aff,
            T_w_curr=T_w_curr, stats=stats,
            kf_received_ts=self.kf_received_ts,
            num_kf_pixels=self.levels[-1].vals.shape[0] // C))

    def decide(self, pending):
        """Keyframe / one-way decision from a dispatched frame's stats."""
        stats = np.asarray(pending["stats"])
        if not np.all(np.isfinite(stats)):
            # tracking diverged (degenerate view, lost overlap): mark the
            # frame lost, restore the last finite relative pose so later
            # frames can re-lock onto the KF reference, and never emit a
            # non-finite pose (SURVEY 5.3: fail soft, no supervision crash)
            pending["lost"] = True
            if (self._last_good is not None
                    and bool(np.all(np.isfinite(np.asarray(
                        self._last_good[0]))))):
                # blocking finiteness check is fine HERE: the lost branch
                # is rare and stats were already synced above
                self.T_curr_kf, self.aff_curr_kf = self._last_good
            else:
                # lost before any finite decide (or _last_good was seeded
                # from a diverged undecided dispatch at a period refresh):
                # identity w.r.t. the KF is the only safe re-lock seed
                self._reset_rel_vars()
            self._T_prev = None
            return None
        self._last_good = (pending["Tji"], pending["aff"])
        if pending.get("promoted_kf"):
            # this frame was already inserted as a keyframe when an older
            # frame's decision resolved (kf_promote_latest): record-keeping
            # only, nothing to decide
            self._prev_motion = None
            return None
        num_reproj = int(stats[0])
        median_depth = float(stats[1])
        kf_dist = float(stats[2])
        rot_angle = float(stats[3])
        num_kf_pixels = pending["num_kf_pixels"]
        timestamp = pending["ts"]

        kcfg = self.cfg.keyframing
        # EMA-smoothed median depth (stat_ema=0 -> off): the per-frame
        # median over an occluded world is noisy, and the keyframe trigger
        # multiplies it into the motion threshold — smoothing decouples
        # keyframe timing from single-frame median flicker.
        if kcfg.stat_ema > 0.0:
            if self._med_ema is not None:
                median_depth = (kcfg.stat_ema * self._med_ema
                                + (1.0 - kcfg.stat_ema) * median_depth)
            self._med_ema = median_depth
        # rotation-aware motion: a rotation theta sweeps scene points
        # sideways by ~ depth * theta, destroying overlap exactly like a
        # baseline of that length; fold it into the distance criterion
        # (kf_rot_weight=0 -> the reference's translation-only rule).
        # mode "max" lets the rotation term drive the trigger only when it
        # DOMINATES the viewpoint change: on translation-dominant worlds
        # the timing stays bit-identical to the translation-only rule
        # (sum-folding measured +5 cm on a translation world's worst seed,
        # because every small rotation nudged the trigger earlier), while
        # rotation-dominant worlds (orbits) trigger at theta >
        # kf_depth_motion_ratio / kf_rot_weight regardless of depth.
        rot_mode = kcfg.kf_rot_mode
        if kcfg.kf_rot_weight > 0.0:
            rot_motion = kcfg.kf_rot_weight * median_depth * rot_angle
            if rot_mode == "max":
                kf_dist = max(kf_dist, rot_motion)
            else:
                kf_dist = kf_dist + rot_motion
        # dispatch-lag anticipation: decisions resolve `lag` frames after
        # dispatch, so by the time a trigger lands the camera has moved
        # ~lag frames past it.  Extrapolate the (monotone-growing) motion
        # criterion by the per-frame rate so the trigger fires when the
        # PIPELINE HEAD crosses the threshold, not the lag-old frame.
        # -1 = AUTO: anticipate exactly the dispatch lag when it is short
        # (<= 2 frames), nothing when it is deep — rate extrapolation is
        # only trustworthy over a short horizon (measured: ant=2 at
        # dispatch depth 6 moved a bench seed 14.3 -> 20.9 cm; ant=depth
        # at depth 2 cut the 400-frame orbit 63.7 -> 25.5 cm), and at deep
        # batched dispatch kf_promote_latest already absorbs staleness.
        anticipate = kcfg.kf_anticipate
        if anticipate < 0:
            anticipate = self.decision_lag if self.decision_lag <= 2 else 0
        if anticipate > 0:
            if self._prev_motion is not None:
                rate = max(0.0, kf_dist - self._prev_motion)
                self._prev_motion = kf_dist
                kf_dist = kf_dist + anticipate * rate
            else:
                self._prev_motion = kf_dist

        frame_kind = None
        # Gate on the reference timestamp AT DISPATCH (the pending
        # snapshot), not the tracker's current one: with dispatch_depth
        # >= 2 a frame tracked against the PREVIOUS keyframe resolves
        # after the new KF already landed, and its stale stats (large
        # kf_dist w.r.t. the old reference) must not retrigger a
        # keyframe (measured: depth-2 clutter runs inserted 9 KFs
        # instead of 5, ATE 11.9 cm vs 9.2 cm).
        ref_ts = pending["kf_received_ts"]
        if self.last_kf_sent_ts <= ref_ts:
            if (kf_dist > kcfg.kf_depth_motion_ratio * median_depth
                    or kcfg.kf_num_pixels_frac > num_reproj / num_kf_pixels):
                frame_kind = "keyframe"
                self.last_kf_sent_ts = timestamp
        if frame_kind is None:
            extra = 1 if self.last_kf_sent_ts > ref_ts else 0
            thresh_scale = (1.0 + self.num_one_way_since_kf + extra) / (1.0 + kcfg.one_way_freq)
            dist_thresh = kcfg.kf_depth_motion_ratio * median_depth
            pixel_thresh = (1.0 - kcfg.kf_num_pixels_frac) * num_kf_pixels
            num_empty = num_kf_pixels - num_reproj
            if (kf_dist > thresh_scale * dist_thresh
                    or num_empty > thresh_scale * pixel_thresh):
                frame_kind = "one-way"
                self.num_one_way_since_kf += 1

        if frame_kind is None:
            return None
        return (frame_kind, pending["rgb"], pending["Tji"], pending["aff"],
                pending["kf_received_ts"], timestamp)

    def handle_frame(self, timestamp: float, rgb: jax.Array):
        """Synchronous track-then-decide (reference handle_frame)."""
        pending = self.dispatch_frame(timestamp, rgb)
        track_data_map = self.decide(pending)
        T = None if pending.get("lost") else pending["T_w_curr"]
        return (timestamp, T), track_data_map

    def get_curr_world_pose(self):
        return transforms.get_T_w_curr(self.T_w_kf[None], self.T_curr_kf[None])[0]
