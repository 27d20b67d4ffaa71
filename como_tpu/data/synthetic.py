"""Procedural multi-view test scenes with exact ground truth.

The reference has no test harness at all (SURVEY.md section 4); ours is a
photometrically consistent synthetic world: a tilted textured plane whose
depth under ANY camera pose has a closed form (ray/plane intersection) and
whose texture is a smooth band-limited function of the *world* point — so
every rendered view is exactly multi-view consistent, ideal for validating
tracking / SfM / BA convergence against known poses and depths.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from como_tpu.geometry import lie


def default_intrinsics(img_size=(192, 256), dtype=jnp.float32) -> jax.Array:
    h, w = img_size
    f = 0.9 * w
    return jnp.array([[f, 0.0, (w - 1) / 2.0], [0.0, f, (h - 1) / 2.0],
                      [0.0, 0.0, 1.0]], dtype=dtype)


def _texture(Pw: jax.Array, freqs: jax.Array, amps: jax.Array, phases: jax.Array):
    """Smooth world-space texture: sum of random low-frequency plane waves.

    Pw (..., 3); freqs (K, 3); amps (K,); phases (K,). Output in ~[0, 1].
    """
    arg = jnp.einsum("...i,ki->...k", Pw, freqs) + phases
    val = jnp.einsum("...k,k->...", jnp.sin(arg), amps)
    return 0.5 + val


class PlaneScene:
    """World = plane n . P = d0 (slightly tilted, ~2m away), smooth texture."""

    def __init__(self, img_size=(192, 256), seed: int = 0, num_waves: int = 24,
                 max_freq: float = 6.0):
        self.img_size = tuple(img_size)
        self.K = default_intrinsics(img_size)
        rng = np.random.default_rng(seed)
        n = np.array([0.15, -0.1, 1.0])
        self.normal = jnp.array(n / np.linalg.norm(n), jnp.float32)
        self.d0 = jnp.float32(2.0)
        f = rng.uniform(0.5, max_freq, size=(num_waves, 3))
        a = rng.uniform(0.2, 1.0, size=num_waves)
        a = 0.35 * a / a.sum() * num_waves ** 0.5
        self.freqs = jnp.array(f, jnp.float32)
        self.amps = jnp.array(a, jnp.float32)
        self.phases = jnp.array(rng.uniform(0, 2 * np.pi, size=num_waves), jnp.float32)

    @partial(jax.jit, static_argnums=(0,))
    def render(self, T_wc: jax.Array):
        """Render a view from camera-to-world pose T_wc (4, 4).

        Returns rgb (1, 3, H, W) in [0,1] and depth (1, 1, H, W) (z-depth).
        """
        h, w = self.img_size
        K = self.K
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        rx = (xs - K[0, 2]) / K[0, 0]
        ry = (ys - K[1, 2]) / K[1, 1]
        r = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)  # camera rays, z=1

        R = T_wc[:3, :3]
        t = T_wc[:3, 3]
        d_world = jnp.einsum("ij,hwj->hwi", R, r)
        denom = jnp.einsum("hwi,i->hw", d_world, self.normal)
        s = (self.d0 - jnp.dot(self.normal, t)) / denom  # z-depth (ray has z=1 in cam)
        Pw = t[None, None] + s[..., None] * d_world

        tex = _texture(Pw, self.freqs, self.amps, self.phases)
        tex = jnp.clip(tex, 0.0, 1.0)
        rgb = jnp.stack([tex, tex, tex], axis=0)[None]
        depth = s[None, None]
        return rgb, depth

    def trajectory(self, n_frames: int, step: float = 0.02, rot_step: float = 0.004,
                   seed: int = 1):
        """Smooth forward-sideways camera path; returns (n, 4, 4) world poses."""
        rng = np.random.default_rng(seed)
        poses = [np.eye(4, dtype=np.float32)]
        xi = np.zeros(6, dtype=np.float32)
        for _ in range(n_frames - 1):
            xi[:3] = 0.7 * xi[:3] + rot_step * rng.normal(size=3)
            xi[3:] = 0.7 * xi[3:] + step * (rng.normal(size=3) * [1.0, 1.0, 0.4] + [0.5, 0.1, 0.0])
            T_next = poses[-1] @ np.array(lie.se3_exp(jnp.array(xi)))
            poses.append(T_next.astype(np.float32))
        return jnp.array(np.stack(poses))


class SyntheticDataset:
    """Dataset-shaped wrapper over PlaneScene: iterates (timestamp, rgb)."""

    def __init__(self, n_frames: int = 60, img_size=(192, 256), fps: float = 30.0,
                 seed: int = 0, step: float = 0.02):
        self.scene = PlaneScene(img_size=img_size, seed=seed)
        self.poses = self.scene.trajectory(n_frames, step=step)
        self.fps = fps
        self.intrinsics = self.scene.K
        self.img_size = tuple(img_size)
        self.is_live = False
        self.save_traj_name = "synthetic"

    def __len__(self):
        return self.poses.shape[0]

    def __getitem__(self, idx):
        rgb, _ = self.scene.render(self.poses[idx])
        return idx / self.fps, rgb

    def gt_pose(self, idx):
        return self.poses[idx]

    def gt_depth(self, idx):
        _, d = self.scene.render(self.poses[idx])
        return d
