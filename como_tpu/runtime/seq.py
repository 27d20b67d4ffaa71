"""Sequential engine: tracking + mapping in one loop (headless).

Spec: reference como/odom/sequential/{ComoSeq,TrackingSeq,MappingSeq}.py,
but inverted: the reference's main loop lives inside the Open3D GUI
window; here the engine is a plain object driven by `step(ts, rgb)` —
the GUI (or nothing) observes it.

Open-loop scheduling (TPU): the engine never blocks on the current
frame's results.  Each step (1) resolves the *previous* frame's
keyframe/one-way decision from its (by now computed) stats, feeding
mapping, (2) dispatches one mapping GN iteration, (3) dispatches the
current frame's tracking.  Host<->device syncs thus overlap with device
work and the dispatch queue stays full — essential when each program
execution carries fixed overhead (remote-attached TPU).  Decisions land
one frame later than the reference's; the thresholds are heuristics and
the effect on ATE is nil (pinned by tests).
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np

from como_tpu.config import ComoConfig
from como_tpu.odom.mapping import Mapping
from como_tpu.odom.tracking import Tracking
from como_tpu.utils.io import save_traj
from como_tpu.utils.log import EventLog


class ComoSeq:
    def __init__(self, cfg: ComoConfig, intrinsics, img_size):
        self.cfg = cfg
        self.tracking = Tracking(cfg=cfg.tracking, intrinsics=intrinsics,
                                 img_size=tuple(img_size))
        self.mapping = Mapping(cfg.mapping, intrinsics, tuple(img_size))
        self.timestamps: List[float] = []
        self.est_poses: List = []       # device arrays; converted lazily
        self.viz_listener = None
        self.ref_period = 0.25  # seconds of *dataset time* between refreshes
        self._last_ref_ts = -1e9
        self._pending: List = []
        self.decision_lag = 1  # frames of dispatch depth before deciding
        self.log = EventLog()

    def setup(self):
        self.tracking.setup()
        self.mapping.setup()

    def _resolve_one(self):
        """Decide + record the oldest dispatched frame."""
        m = self.mapping
        p = self._pending.pop(0)
        track_map = self.tracking.decide(p)
        self.timestamps.append(p["ts"])
        self.est_poses.append(p["T_w_curr"])
        kf_inserted = False
        if track_map is not None:
            kf_inserted = m.handle_tracking_data(track_map)
            self.log.emit("insert", frame_kind=track_map[0], ts=p["ts"],
                          num_kf=m.num_kf, num_ow=m.num_ow)
        return kf_inserted

    def step(self, timestamp: float, rgb):
        """Process one frame; returns the latest world pose estimate
        (device array) or None before initialization."""
        m = self.mapping

        if not m.is_init:
            self._pending = []
            m.attempt_two_frame_init(timestamp, rgb)
            if m.is_init:
                pose = m.state.kf_pose[m.num_kf - 1]
                self.timestamps.append(timestamp)
                self.est_poses.append(pose)
                self._refresh_reference(timestamp, force=True)
                return pose
            return None

        kf_inserted = False
        while len(self._pending) >= self.decision_lag:
            kf_inserted |= self._resolve_one()
        if kf_inserted or (timestamp - self._last_ref_ts > self.ref_period):
            self._refresh_reference(timestamp)
        m.maybe_iterate()
        self._pending.append(self.tracking.dispatch_frame(timestamp, rgb))
        return self._pending[-1]["T_w_curr"]

    def finish(self):
        """Resolve the remaining dispatched frames (stream end)."""
        if self.mapping.is_init:
            while self._pending:
                self._resolve_one()

    def _refresh_reference(self, timestamp, force=False):
        m = self.mapping
        ref = m.get_kf_ref_data(self.cfg.mapping.track_ref_num_keyframes)
        self.tracking.update_kf_reference(ref)
        self._last_ref_ts = timestamp
        if self.viz_listener is not None:
            self.viz_listener(m.get_kf_viz_data())

    def run(self, dataset, max_frames: Optional[int] = None, verbose=False):
        n = len(dataset) if max_frames is None else min(len(dataset), max_frames)
        t0 = time.perf_counter()
        for i in range(n):
            ts, rgb = dataset[i]
            self.step(float(ts), rgb)
            if verbose and i % 30 == 0:
                dt = time.perf_counter() - t0
                print(f"frame {i}/{n}  ({(i + 1) / dt:.1f} FPS)")
        self.finish()
        est = np.stack([np.array(p) for p in self.est_poses]) \
            if self.est_poses else np.zeros((0, 4, 4))
        return np.array(self.timestamps), est

    def save_trajectory(self, path: str):
        est = np.stack([np.array(p) for p in self.est_poses])
        save_traj(path, self.timestamps, est)
