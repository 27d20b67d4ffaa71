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
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from como_tpu.geometry import lie


class PhotoNuisance(NamedTuple):
    """Photometric nuisance model for the synthetic worlds.

    Real sequences are not photometrically sterile: TUM/RealSense cameras
    run auto-exposure (reference data/RealsenseDataset.py:47-49), lenses
    vignette, and sensors add noise — it is exactly this that makes the
    jointly-estimated per-frame affine-brightness states
    (reference geometry/affine_brightness.py:5-16, Mapping.py:370-372)
    load-bearing.  The model applied to a clean render I:

        I' = exp(a_t) * (V(p) * I) + b_t + noise_sigma * N(0, 1)

    where (a_t, b_t) is a known per-frame AR(1) random walk (ground truth
    available via SyntheticDataset.gt_affine) and V(p) = 1 - vignette *
    (r / r_max)^2 is a static radial falloff.  Exposure/bias are exactly
    the system's affine model; vignetting and noise are deliberate model
    violations that stress the Huber/MAD robust machinery.  No sensor
    clipping: the affine relation stays exact where it is supposed to.
    """
    exposure_jitter: float = 0.0   # AR(1) innovation std of log-gain a_t
    bias_jitter: float = 0.0      # AR(1) innovation std of bias b_t
    noise_sigma: float = 0.0      # per-pixel Gaussian sensor noise
    vignette: float = 0.0         # corner falloff strength in [0, 1)
    ar_decay: float = 0.97        # AR(1) pole (stationary std = jitter/sqrt(1-d^2))


# the "photo" scene-variant preset: stationary log-gain std ~0.16
# (per-frame gain swinging ~0.85-1.17x), bias std ~0.04, 1% sensor noise,
# 15% corner vignetting
PHOTO_NUISANCE = PhotoNuisance(exposure_jitter=0.04, bias_jitter=0.01,
                               noise_sigma=0.01, vignette=0.15)


@partial(jax.jit, static_argnames=("noise_sigma",))
def _apply_nuisance(rgb, a, b, vmap_img, key, noise_sigma: float):
    out = jnp.exp(a) * (vmap_img * rgb) + b
    if noise_sigma > 0.0:
        out = out + noise_sigma * jax.random.normal(key, rgb.shape, rgb.dtype)
    return out


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
                 max_freq: float = 6.0, chroma: bool = False):
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
        # chroma: per-channel phase offsets + an RGB base color decorrelate
        # the channels, so color genuinely carries extra gradient structure
        # (chroma=False keeps the legacy gray x3 render bit-identical)
        self.chroma = chroma
        if chroma:
            self.base_rgb = jnp.array(rng.uniform(0.3, 0.7, size=3), jnp.float32)
            self.chan_phase = jnp.array(rng.uniform(0, 2 * np.pi, size=3),
                                        jnp.float32)

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

        if self.chroma:
            arg = jnp.einsum("hwi,ki->hwk", Pw, self.freqs) + self.phases
            argc = arg[..., None] + self.chan_phase          # (H, W, K, 3)
            tex = self.base_rgb + jnp.einsum("hwkc,k->hwc", jnp.sin(argc),
                                             self.amps)
            rgb = jnp.clip(tex, 0.0, 1.0).transpose(2, 0, 1)[None]
        else:
            tex = _texture(Pw, self.freqs, self.amps, self.phases)
            tex = jnp.clip(tex, 0.0, 1.0)
            rgb = jnp.stack([tex, tex, tex], axis=0)[None]
        depth = s[None, None]
        return rgb, depth

    def trajectory(self, n_frames: int, step: float = 0.02, rot_step: float = 0.004,
                   seed: int = 1, min_dist: float = 0.8):
        """Smooth forward-sideways camera path; returns (n, 4, 4) world poses.

        The walk is reflected off a standoff surface `min_dist` in front of
        the scene plane: long runs stay in-domain instead of the camera
        drifting through the plane (which makes any odometry problem
        ill-posed as depth -> 0)."""
        rng = np.random.default_rng(seed)
        poses = [np.eye(4, dtype=np.float32)]
        n_np = np.array(self.normal, np.float64)
        d0 = float(self.d0)
        xi = np.zeros(6, dtype=np.float32)
        for _ in range(n_frames - 1):
            xi[:3] = 0.7 * xi[:3] + rot_step * rng.normal(size=3)
            xi[3:] = 0.7 * xi[3:] + step * (rng.normal(size=3) * [1.0, 1.0, 0.4] + [0.5, 0.1, 0.0])
            T_next = poses[-1] @ np.array(lie.se3_exp(jnp.array(xi)))
            if d0 - n_np @ T_next[:3, 3] < min_dist:
                # reflect the drift velocity off the standoff surface
                # (xi[3:] is body-frame: reflect about the body-frame normal)
                n_body = (poses[-1][:3, :3].T @ n_np).astype(np.float32)
                xi[3:] -= 2.0 * (xi[3:] @ n_body) * n_body
                T_next = poses[-1] @ np.array(lie.se3_exp(jnp.array(xi)))
            poses.append(T_next.astype(np.float32))
        return jnp.array(np.stack(poses))


class ClutterScene:
    """Hard synthetic world: ground plane + back wall + spheres + boxes.

    Everything has a closed-form ray intersection, so depth is exact under
    any pose and every view is exactly multi-view consistent.  Unlike
    PlaneScene this world has occlusions, large depth discontinuities at
    object silhouettes, and per-object texture discontinuities — it
    stresses the correspondence discontinuity filter, behind-camera
    landmark reinit, and the robust losses the way real sequences
    (the reference's validation path, /root/reference/README.md:25-31) do.

    Camera convention: x right, y down, z forward; cameras start at the
    origin looking +z.  The ground is at y = +0.9 (below), the back wall
    at z = 4.2, objects scattered at depths ~1.2-3 m.
    """

    EPS = 5e-2  # min hit distance (z-depth)

    def __init__(self, img_size=(192, 256), seed: int = 0, num_waves: int = 24,
                 max_freq: float = 6.0, num_spheres: int = 5, num_boxes: int = 3,
                 chroma: bool = False):
        self.img_size = tuple(img_size)
        self.K = default_intrinsics(img_size)
        self.chroma = chroma
        rng = np.random.default_rng(seed)

        # primitives: 2 planes + spheres + boxes
        # object cluster sits around the orbit center (z ~ 2.8) with >= ~1.2 m
        # clearance from the camera arc (trajectory() orbits at radius 2.8
        # through x in [-2.2, 0], z in [0, 1.0]) — hard geometry in view,
        # but the camera never brushes an object.
        planes_n = np.array([[0.0, -1.0, 0.02],        # ground (y = +0.9)
                             [0.08, -0.06, -1.0]])     # back wall (z ~ 4.8)
        planes_n = planes_n / np.linalg.norm(planes_n, axis=-1, keepdims=True)
        planes_d = np.array([np.dot(planes_n[0], [0.0, 0.9, 0.0]),
                             np.dot(planes_n[1], [0.0, 0.0, 4.8])])
        centers = np.stack([
            rng.uniform(-0.9, 0.9, size=num_spheres),
            rng.uniform(-0.35, 0.75, size=num_spheres),
            rng.uniform(1.8, 3.4, size=num_spheres),
        ], axis=-1)
        radii = rng.uniform(0.15, 0.35, size=num_spheres)
        box_c = np.stack([
            rng.uniform(-1.0, 1.0, size=num_boxes),
            rng.uniform(0.0, 0.7, size=num_boxes),
            rng.uniform(2.0, 3.6, size=num_boxes),
        ], axis=-1)
        box_h = np.stack([
            rng.uniform(0.15, 0.4, size=num_boxes),
            rng.uniform(0.15, 0.5, size=num_boxes),
            rng.uniform(0.12, 0.3, size=num_boxes),
        ], axis=-1)
        self.planes_n = jnp.array(planes_n, jnp.float32)
        self.planes_d = jnp.array(planes_d, jnp.float32)
        self.sph_c = jnp.array(centers, jnp.float32)
        self.sph_r = jnp.array(radii, jnp.float32)
        self.box_lo = jnp.array(box_c - box_h, jnp.float32)
        self.box_hi = jnp.array(box_c + box_h, jnp.float32)

        # per-primitive world-space texture (texture discontinuity at
        # silhouettes): each primitive gets its own wave set
        n_prim = 2 + num_spheres + num_boxes
        self.n_prim = n_prim
        f = rng.uniform(0.8, max_freq, size=(n_prim, num_waves, 3))
        a = rng.uniform(0.2, 1.0, size=(n_prim, num_waves))
        a = 0.35 * a / a.sum(axis=-1, keepdims=True) * num_waves ** 0.5
        ph = rng.uniform(0, 2 * np.pi, size=(n_prim, num_waves))
        # distinct per-primitive mean brightness to make silhouettes pop
        self.base = jnp.array(rng.uniform(0.35, 0.65, size=n_prim), jnp.float32)
        self.freqs = jnp.array(f, jnp.float32)
        self.amps = jnp.array(a, jnp.float32)
        self.phases = jnp.array(ph, jnp.float32)
        # chroma: per-primitive RGB base color + per-channel phase offsets
        # (color discontinuities at silhouettes, channel-decorrelated
        # texture detail); chroma=False keeps the legacy gray x3 render
        if chroma:
            self.base_rgb = jnp.array(rng.uniform(0.3, 0.7, size=(n_prim, 3)),
                                      jnp.float32)
            self.chan_phase = jnp.array(
                rng.uniform(0, 2 * np.pi, size=(n_prim, 3)), jnp.float32)

    @partial(jax.jit, static_argnums=(0,))
    def render(self, T_wc: jax.Array):
        """Render from camera-to-world pose T_wc (4,4) by exact ray casting.

        Returns rgb (1, 3, H, W) in [0,1] and z-depth (1, 1, H, W).
        """
        h, w = self.img_size
        K = self.K
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        rx = (xs - K[0, 2]) / K[0, 0]
        ry = (ys - K[1, 2]) / K[1, 1]
        r = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)  # cam rays, z=1

        R = T_wc[:3, :3]
        o = T_wc[:3, 3]
        d = jnp.einsum("ij,hwj->hwi", R, r)  # world ray dirs (z-depth param)
        INF = jnp.float32(1e9)

        # planes: t = (d0 - n.o) / (n.d)
        ndotd = jnp.einsum("hwi,pi->hwp", d, self.planes_n)
        t_pl = (self.planes_d[None, None] - jnp.dot(self.planes_n, o)) / ndotd
        t_pl = jnp.where(t_pl > self.EPS, t_pl, INF)

        # spheres: |o + t d - c|^2 = r^2, near root
        oc = o[None] - self.sph_c                        # (S, 3)
        a2 = jnp.sum(d * d, axis=-1)[..., None]          # (H, W, 1)
        b = 2.0 * jnp.einsum("hwi,si->hws", d, oc)
        c = jnp.sum(oc * oc, axis=-1)[None, None] - (self.sph_r ** 2)[None, None]
        disc = b * b - 4.0 * a2 * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_sp = (-b - sq) / (2.0 * a2)
        t_sp = jnp.where((disc > 0) & (t_sp > self.EPS), t_sp, INF)

        # boxes: slab method
        safe_d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)[:, :, None, :]  # (H,W,1,3)
        t0 = (self.box_lo[None, None] - o) / safe_d
        t1 = (self.box_hi[None, None] - o) / safe_d
        t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)   # (H, W, B)
        t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        t_bx = jnp.where((t_near <= t_far) & (t_near > self.EPS), t_near, INF)

        t_all = jnp.concatenate([t_pl, t_sp, t_bx], axis=-1)  # (H, W, P)
        idx = jnp.argmin(t_all, axis=-1)                       # (H, W)
        t_hit = jnp.take_along_axis(t_all, idx[..., None], axis=-1)[..., 0]
        t_hit = jnp.minimum(t_hit, 50.0)  # rays that miss: far dome
        Pw = o[None, None] + t_hit[..., None] * d

        # per-primitive texture gathered at the hit index
        fr = self.freqs[idx]        # (H, W, K, 3)
        am = self.amps[idx]
        ph = self.phases[idx]
        arg = jnp.einsum("hwi,hwki->hwk", Pw, fr) + ph
        if self.chroma:
            argc = arg[..., None] + self.chan_phase[idx][..., None, :]  # (H,W,K,3)
            tex = self.base_rgb[idx] + jnp.einsum("hwkc,hwk->hwc",
                                                  jnp.sin(argc), am)
            rgb = jnp.clip(tex, 0.0, 1.0).transpose(2, 0, 1)[None]
        else:
            tex = self.base[idx] + jnp.einsum("hwk,hwk->hw", jnp.sin(arg), am)
            tex = jnp.clip(tex, 0.0, 1.0)
            rgb = jnp.stack([tex, tex, tex], axis=0)[None]
        depth = t_hit[None, None]
        return rgb, depth

    def trajectory(self, n_frames: int, step: float = 0.012,
                   rot_step: float = 0.0, seed: int = 1):
        """Orbit arc around the scene with look-at orientation plus smooth
        positional noise: the clutter stays in view, parallax is strong,
        and (unlike PlaneScene's near-pure-translation walk) the camera
        genuinely rotates — total yaw grows with n_frames * step.

        step ~ linear metres per frame along the arc; rot_step adds extra
        smooth look-target jitter (radians-scale).
        """
        rng = np.random.default_rng(seed)
        center = np.array([0.0, 0.25, 2.8])
        start = np.zeros(3)
        radius = np.linalg.norm(center - start)
        theta0 = np.arctan2(start[0] - center[0], start[2] - center[2])
        down = np.array([0.0, 1.0, 0.0])

        poses = []
        pos_noise = np.zeros(3)
        tgt_noise = np.zeros(3)
        theta = theta0
        for _ in range(n_frames):
            pos_noise = 0.85 * pos_noise + 0.3 * step * rng.normal(size=3)
            tgt_noise = 0.85 * tgt_noise + (0.2 * step + 0.5 * rot_step) \
                * rng.normal(size=3)
            pos = center + radius * np.array(
                [np.sin(theta), 0.0, np.cos(theta)]) + pos_noise
            pos[1] = start[1] + pos_noise[1]  # stay at eye height
            z = center + tgt_noise - pos
            z = z / np.linalg.norm(z)
            x = np.cross(down, z)
            x = x / np.linalg.norm(x)
            y = np.cross(z, x)
            T = np.eye(4, dtype=np.float32)
            T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = x, y, z, pos
            poses.append(T)
            theta += step / radius
        return jnp.array(np.stack(poses))


_SCENES = {"plane": PlaneScene, "clutter": ClutterScene}


class SyntheticDataset:
    """Dataset-shaped wrapper over a synthetic scene: iterates (ts, rgb).

    scene="plane" is the easy single-plane world; scene="clutter" is the
    hard multi-object world with occlusions and depth discontinuities.
    Variants (scene="<base>_<variant>"):
      * "<base>_chroma": chromatic per-primitive textures (RGB channels
        carry decorrelated gradient structure) -- clean photometry.
      * "<base>_photo":  chroma + the PHOTO_NUISANCE preset (per-frame
        exposure/bias jitter with known ground truth, sensor noise,
        vignetting) -- the photometrically *real* worlds the reference
        validates on by nature of its data (TUM auto-exposure,
        reference data/RealsenseDataset.py:47-49).
    An explicit `nuisance=PhotoNuisance(...)` overrides the preset.
    """

    def __init__(self, n_frames: int = 60, img_size=(192, 256), fps: float = 30.0,
                 seed: int = 0, step: float = 0.02, scene: str = "plane",
                 rot_step: float | None = None,
                 nuisance: PhotoNuisance | None = None):
        base, _, variant = scene.partition("_")
        if base not in _SCENES or variant not in ("", "chroma", "photo"):
            raise ValueError(
                f"unknown synthetic scene '{scene}' (have "
                f"{sorted(_SCENES)} x ['', '_chroma', '_photo'])")
        chroma = variant in ("chroma", "photo")
        if nuisance is None and variant == "photo":
            nuisance = PHOTO_NUISANCE
        # Frame synthesis is INPUT ACQUISITION, not SLAM compute: pin it to
        # the host CPU backend (like the reference streaming dataset PNGs
        # from disk, como/data/odom_datasets.py).  On a remote-attached TPU
        # an un-pinned render ran on the chip — one program round trip per
        # frame (measured 44 ms/frame through the tunnel vs 0.4 ms on host).
        self._cpu = jax.devices("cpu")[0]
        with jax.default_device(self._cpu):
            self.scene = _SCENES[base](img_size=img_size, seed=seed,
                                       chroma=chroma)
            traj_kwargs = {} if rot_step is None else {"rot_step": rot_step}
            self.poses = self.scene.trajectory(n_frames, step=step,
                                               **traj_kwargs)
        self.fps = fps
        self.intrinsics = self.scene.K
        self.img_size = tuple(img_size)
        self.is_live = False
        self.save_traj_name = "synthetic"

        self.nuisance = nuisance
        if nuisance is not None:
            rng = np.random.default_rng(seed + 77)
            aff = np.zeros((n_frames, 2), np.float32)
            for t in range(1, n_frames):
                aff[t, 0] = (nuisance.ar_decay * aff[t - 1, 0]
                             + nuisance.exposure_jitter * rng.normal())
                aff[t, 1] = (nuisance.ar_decay * aff[t - 1, 1]
                             + nuisance.bias_jitter * rng.normal())
            self.gt_aff = aff
            h, w = self.img_size
            ys, xs = np.meshgrid(np.arange(h) - (h - 1) / 2,
                                 np.arange(w) - (w - 1) / 2, indexing="ij")
            r2 = (ys ** 2 + xs ** 2) / (((h - 1) / 2) ** 2 + ((w - 1) / 2) ** 2)
            with jax.default_device(self._cpu):
                self._vmap = jnp.asarray(1.0 - nuisance.vignette * r2,
                                         jnp.float32)
                self._noise_key = jax.random.PRNGKey(seed + 177)

    def __len__(self):
        return self.poses.shape[0]

    def __getitem__(self, idx):
        with jax.default_device(self._cpu):
            rgb, _ = self.scene.render(self.poses[idx])
            if self.nuisance is not None:
                rgb = _apply_nuisance(
                    rgb, jnp.float32(self.gt_aff[idx, 0]),
                    jnp.float32(self.gt_aff[idx, 1]), self._vmap,
                    jax.random.fold_in(self._noise_key, idx),
                    self.nuisance.noise_sigma)
        # host numpy, like a decoded camera/disk frame: uncommitted, so the
        # engine's jitted programs upload it to their own device
        return idx / self.fps, np.asarray(rgb)

    def gt_pose(self, idx):
        return self.poses[idx]

    def gt_affine(self, idx):
        """Ground-truth (log-gain, bias) applied to frame idx (zeros for
        clean worlds)."""
        if self.nuisance is None:
            return np.zeros(2, np.float32)
        return self.gt_aff[idx]

    def gt_depth(self, idx):
        with jax.default_device(self._cpu):
            _, d = self.scene.render(self.poses[idx])
        return np.asarray(d)
