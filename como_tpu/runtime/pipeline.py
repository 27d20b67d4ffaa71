"""Pipelined runtime: tracking and mapping decoupled.

Spec: reference como/odom/multiprocessing/{ComoMp,TrackingMp,MappingMp}.py
— a 2-stage asynchronous pipeline with bounded queues, drop-stale
semantics and "end" sentinels.  TPU redesign: host *threads* instead of
processes (JAX dispatch is async and releases the GIL during device
execution, so tracking and mapping device work overlap; device arrays
are shared zero-copy instead of serialized through mp queues).  The
queue layer is the native C++ ring (runtime/queues.py).

Wiring (mirrors ComoMp.py:28-50):
    step()  --rgb_q(5, block)-->  tracking thread
    tracking  --pose_q(drop-stale)-->  step() return
    tracking  --frame_q(1, block)-->  mapping thread
    mapping  --kf_ref_q(drop-stale)-->  tracking
    mapping  --viz_q(drop-stale)-->  observer
"""

from __future__ import annotations

import threading
import time
from typing import List

import numpy as np

from como_tpu.config import ComoConfig
from como_tpu.odom.mapping import Mapping
from como_tpu.odom.tracking import Tracking
from como_tpu.runtime.placement import (device_scope, resolve_device,  # noqa: F401
                                        resolve_stage_devices,
                                        tree_device_put)
from como_tpu.runtime.queues import make_queue
from como_tpu.utils.io import save_traj

_END = ("end",)


class ComoPipeline:
    def __init__(self, cfg: ComoConfig, intrinsics, img_size):
        self.cfg = cfg
        # per-stage device placement (reference como.yml:5,27); each stage
        # thread pins its compute + arrays to its device, and queue messages
        # crossing the stage boundary move via device_put (the TPU analog of
        # TupleTensorQueue's transfer-on-push, multiprocessing.py:41-46)
        self.track_dev, self.map_dev = resolve_stage_devices(
            cfg.tracking.device, cfg.mapping.device)
        if cfg.mapping.mesh_devices >= 2:
            # mesh-sharded BA: run both stages uncommitted (see seq.py)
            self.track_dev = self.map_dev = None
        with device_scope(self.track_dev):
            self.tracking = Tracking(cfg=cfg.tracking, intrinsics=intrinsics,
                                     img_size=tuple(img_size),
                                     decision_lag=cfg.dispatch_depth)
        with device_scope(self.map_dev):
            self.mapping = Mapping(cfg.mapping, intrinsics, tuple(img_size))
        self.rgb_q = make_queue(5)
        self.pose_q = make_queue(8)
        self.frame_q = make_queue(1)
        self.kf_ref_q = make_queue(2)
        self.viz_q = make_queue(2)
        self.timestamps: List[float] = []
        self.est_poses: List[np.ndarray] = []
        self.viz_listener = None
        self._threads: List[threading.Thread] = []

    def setup(self):
        with device_scope(self.track_dev):
            self.tracking.setup()
        with device_scope(self.map_dev):
            self.mapping.setup()
        self._threads = [
            threading.Thread(target=self._tracking_loop, daemon=True,
                             name="tracking"),
            threading.Thread(target=self._mapping_loop, daemon=True,
                             name="mapping"),
        ]
        for t in self._threads:
            t.start()

    # -- tracking thread (reference TrackingMp.run) ---------------------------
    def _tracking_loop(self):
        with device_scope(self.track_dev):
            while True:
                kf_data = self.kf_ref_q.pop_until_latest(timeout=0.002)
                if kf_data is not None:
                    if kf_data[0] == "end":
                        self.pose_q.push(_END, block=False)
                        return
                    self.tracking.update_kf_reference(
                        tree_device_put(kf_data, self.track_dev))

                data = self.rgb_q.pop(timeout=0.002)
                if data is None:
                    continue
                if data[0] == "end":
                    self.frame_q.push(_END)
                    continue
                ts, rgb = data
                if not self.tracking.mapping_init:
                    self.frame_q.push(("init", ts, rgb))
                    continue
                rgb = tree_device_put(rgb, self.track_dev)
                track_viz, track_map = self.tracking.handle_frame(ts, rgb)
                self.pose_q.push(track_viz, block=False)
                if track_map is not None:
                    self.frame_q.push(track_map)

    # -- mapping thread (reference MappingMp.run) ------------------------------
    def _mapping_loop(self):
        m = self.mapping
        last_ref_sent = 0.0
        with device_scope(self.map_dev):
            while True:
                kf_updated = False
                if not m.is_init:
                    data = self.frame_q.pop_until_latest(timeout=0.01)
                    if data is not None:
                        if data[0] == "end":
                            break
                        if data[0] == "init":
                            kf_updated = m.attempt_two_frame_init(
                                data[1], tree_device_put(data[2], self.map_dev))
                else:
                    data = self.frame_q.pop(timeout=0.005)
                    if data is not None:
                        if data[0] == "end":
                            break
                        if data[0] == "init":
                            pass  # stale bootstrap frame raced past init
                        else:
                            data = tree_device_put(data, self.map_dev)
                            kf_updated = m.handle_tracking_data(data)
                            if self.viz_listener is not None:
                                # get_kf_viz_data costs ~K dense-depth
                                # dispatches + host syncs: only pay it
                                # when an observer is attached
                                self.viz_q.push(m.get_kf_viz_data(),
                                                block=False)

                if m.is_init and m.maybe_iterate() is not None:
                    kf_updated = True

                now = time.monotonic()
                if m.is_init and (kf_updated or now - last_ref_sent > 1.0):
                    ref = m.get_kf_ref_data(
                        self.cfg.mapping.track_ref_num_keyframes)
                    self.kf_ref_q.push(ref, block=False)
                    last_ref_sent = now

        self.kf_ref_q.push(_END, block=False)
        self.viz_q.push(_END, block=False)

    # -- host API ---------------------------------------------------------------
    def step(self, timestamp: float, rgb):
        self.rgb_q.push((timestamp, rgb), block=True)
        out = None
        msg = self.pose_q.pop_until_latest()
        if msg is not None and msg[0] != "end":
            ts, T = msg
            if T is None:  # frame lost: hold the last finite pose
                T = self.est_poses[-1] if self.est_poses else np.eye(4)
            out = np.array(T)
            self.timestamps.append(ts)
            self.est_poses.append(out)
        if self.viz_listener is not None:
            viz = self.viz_q.pop_until_latest()
            if viz is not None and (not isinstance(viz, tuple) or viz[0] != "end"):
                self.viz_listener(viz)
        return out

    def shutdown(self, timeout: float = 30.0):
        self.rgb_q.push(_END)
        t0 = time.monotonic()
        for t in self._threads:
            t.join(max(0.1, timeout - (time.monotonic() - t0)))
        # drain the final poses
        while True:
            msg = self.pose_q.pop(timeout=0.05)
            if msg is None or msg[0] == "end":
                break
            ts, T = msg
            if T is None:
                T = self.est_poses[-1] if self.est_poses else np.eye(4)
            self.timestamps.append(ts)
            self.est_poses.append(np.array(T))

    def save_trajectory(self, path: str):
        save_traj(path, self.timestamps, np.stack(self.est_poses))
