"""Optional viewers fed by the engine's viz data.

Role-equivalent of the reference GUI (como/gui/GuiWindow.py — Open3D
window with frustums, landmark spheres, point cloud, trajectory), but as
an *observer*: the core loop is headless; viewers attach via
`engine.viz_listener`.  Two backends:
  * Open3DViewer — interactive, used when open3d is importable,
  * SnapshotViewer — headless fallback: periodically writes PNG frames
    (rendered map via viz/renderer.py + trajectory plot) to a directory.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np


class SnapshotViewer:
    def __init__(self, engine, out_dir: str = "results/viz",
                 period_s: float = 1.0, follow: bool = True):
        self.engine = engine
        self.out_dir = out_dir
        self.period_s = period_s
        self.follow = follow
        self._last = 0.0
        self._count = 0
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, viz):
        now = time.monotonic()
        if now - self._last < self.period_s:
            return
        self._last = now
        try:
            self._snapshot(viz)
        except Exception as e:  # viz must never take down the engine
            print(f"[viz] snapshot failed: {e}")

    def _snapshot(self, viz):
        import jax.numpy as jnp
        from PIL import Image

        from como_tpu.geometry.lie import se3_exp
        from como_tpu.viz.renderer import render_map

        poses = viz["poses"]
        n = poses.shape[0]
        K = self.engine.mapping.K
        # virtual camera: behind and above the latest keyframe
        T_last = poses[-1]
        offset = se3_exp(jnp.array([0.25, 0.0, 0.0, 0.0, -0.15, -0.8]))
        T_view = T_last @ offset if self.follow else jnp.eye(4)
        valid = jnp.ones((n,), bool)
        rgb, _ = render_map(viz["rgbs"], viz["depths"], poses, valid, K, T_view)
        img = np.clip(np.array(rgb) * 255, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(self.out_dir, f"map_{self._count:05d}.png"))
        self._count += 1


class Open3DViewer:
    """Interactive Open3D window (gated: open3d not in the base image)."""

    def __init__(self, engine):
        import open3d as o3d  # raises if unavailable

        self.o3d = o3d
        self.engine = engine
        self.vis = o3d.visualization.Visualizer()
        self.vis.create_window("como_tpu", width=960, height=720)
        self.pcd = o3d.geometry.PointCloud()
        self._added = False

    def __call__(self, viz):
        import numpy as np
        o3d = self.o3d
        rgbs = np.array(viz["rgbs"])          # (K, 3, H, W)
        depths = np.array(viz["depths"])      # (K, 1, H, W)
        poses = np.array(viz["poses"])
        K = np.array(self.engine.mapping.K)
        pts, cols = [], []
        H, W = depths.shape[-2:]
        ys, xs = np.mgrid[0:H, 0:W]
        for k in range(rgbs.shape[0]):
            z = depths[k, 0]
            rx = (xs - K[0, 2]) / K[0, 0]
            ry = (ys - K[1, 2]) / K[1, 1]
            P = np.stack([rx * z, ry * z, z], -1).reshape(-1, 3)
            Pw = P @ poses[k, :3, :3].T + poses[k, :3, 3]
            pts.append(Pw[::4])
            cols.append(rgbs[k].transpose(1, 2, 0).reshape(-1, 3)[::4])
        self.pcd.points = o3d.utility.Vector3dVector(np.concatenate(pts))
        self.pcd.colors = o3d.utility.Vector3dVector(np.concatenate(cols))
        if not self._added:
            self.vis.add_geometry(self.pcd)
            self._added = True
        else:
            self.vis.update_geometry(self.pcd)
        self.vis.poll_events()
        self.vis.update_renderer()


def attach_viewer(engine, out_dir: str = "results/viz"):
    try:
        viewer = Open3DViewer(engine)
    except Exception:
        viewer = SnapshotViewer(engine, out_dir=out_dir)
    engine.viz_listener = viewer
    return viewer
