"""Sequential engine: tracking + mapping in one loop (headless).

Spec: reference como/odom/sequential/{ComoSeq,TrackingSeq,MappingSeq}.py,
but inverted: the reference's main loop lives inside the Open3D GUI
window; here the engine is a plain object driven by `step(ts, rgb)` —
the GUI (or nothing) observes it.  Per frame: track -> maybe feed
mapping -> one mapping GN iteration -> refresh the tracker's keyframe
reference when mapping updated it.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from como_tpu.config import ComoConfig
from como_tpu.odom.mapping import Mapping
from como_tpu.odom.tracking import Tracking
from como_tpu.utils.io import save_traj


class ComoSeq:
    def __init__(self, cfg: ComoConfig, intrinsics, img_size):
        self.cfg = cfg
        self.tracking = Tracking(cfg=cfg.tracking, intrinsics=intrinsics,
                                 img_size=tuple(img_size))
        self.mapping = Mapping(cfg.mapping, intrinsics, tuple(img_size))
        self.timestamps: List[float] = []
        self.est_poses: List[np.ndarray] = []
        self.viz_listener = None
        self.ref_period = 0.25  # seconds of *dataset time* between refreshes
        self._last_ref_ts = -1e9

    def setup(self):
        self.tracking.setup()
        self.mapping.setup()

    def step(self, timestamp: float, rgb) -> Optional[np.ndarray]:
        """Process one frame; returns the current world pose estimate (4,4)
        or None before initialization."""
        m = self.mapping
        pose_out = None
        kf_updated = False

        if not m.is_init:
            kf_updated = m.attempt_two_frame_init(timestamp, rgb)
            if m.is_init:
                pose_out = np.array(m.state.kf_pose[m.num_kf - 1])
        else:
            track_viz, track_map = self.tracking.handle_frame(timestamp, rgb)
            ts, T_w_curr = track_viz
            pose_out = np.array(T_w_curr)
            if track_map is not None:
                kf_updated = m.handle_tracking_data(track_map)
            m.maybe_iterate()

        # refresh the tracking reference on new-keyframe insertion and
        # periodically (poses refine across iterations; the reference
        # rebuilds each map() call — here rate-limited because the rebuild
        # is itself device work)
        refresh = kf_updated or (timestamp - self._last_ref_ts > self.ref_period)
        if refresh and m.is_init:
            ref = m.get_kf_ref_data(self.cfg.mapping.track_ref_num_keyframes)
            self.tracking.update_kf_reference(ref)
            self._last_ref_ts = timestamp
            if self.viz_listener is not None:
                self.viz_listener(m.get_kf_viz_data())

        if pose_out is not None:
            self.timestamps.append(timestamp)
            self.est_poses.append(pose_out)
        return pose_out

    def run(self, dataset, max_frames: Optional[int] = None, verbose=False):
        n = len(dataset) if max_frames is None else min(len(dataset), max_frames)
        t0 = time.perf_counter()
        for i in range(n):
            ts, rgb = dataset[i]
            self.step(float(ts), rgb)
            if verbose and i % 30 == 0:
                dt = time.perf_counter() - t0
                print(f"frame {i}/{n}  ({(i + 1) / dt:.1f} FPS)")
        return np.array(self.timestamps), np.stack(self.est_poses) \
            if self.est_poses else np.zeros((0, 4, 4))

    def save_trajectory(self, path: str):
        save_traj(path, self.timestamps, np.stack(self.est_poses))
