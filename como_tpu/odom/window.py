"""Sliding-window state: one pytree, all static shapes.

The reference grows/shrinks python lists and re-concatenates tensors on
every keyframe (como/odom/Mapping.py window_cat_helper_*); on TPU that
would retrace constantly.  Here the window is a fixed-capacity pytree:

  * K_MAX keyframe slots (valid-prefix mask, oldest at slot 0; insertion
    rolls left when full),
  * O_MAX one-way-frame slots (same layout),
  * every keyframe owns exactly M anchors; anchor (k, m) refers to a
    global landmark slot through `anchor_lm[k, m]` — this index map
    replaces the reference's boolean correspondence-mask remapping
    (sparse_map.get_batch_remap_function) with plain gathers,
  * L_MAX = K_MAX * M landmark slots with a host-side free-list
    allocator (landmarks can outlive their defining keyframe, as in the
    reference; total live references never exceed K_MAX * M, so L_MAX
    slots always suffice).

The GN iterate (backend/gn_step.py) is a pure jitted function of this
state; keyframe insertion is host-orchestrated but built from jitted
kernels plus trivial numpy bookkeeping on the 576-slot allocator.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class WindowDims(NamedTuple):
    K: int          # max keyframes (reference graph.num_keyframes = 9)
    O: int          # max one-way frames (24)
    M: int          # anchors per keyframe (64)
    H: int
    W: int
    ND: int         # dense photometric sites per KF (H*W/16 for nms=4)
    L: int          # landmark slots = K*M
    P: int          # static photometric-pair capacity (pairs.max_pairs)
    C: int = 1      # photometric channels (mapping.color: gray=1, rgb=3)
    NW: int = 4     # dense-site NMS window (ND = (H/NW)*(W/NW))

    @property
    def D(self) -> int:
        """Total GN system dimension: 8 per frame + 3 per landmark."""
        return 8 * self.K + 8 * self.O + 3 * self.L


def make_dims(num_kf=9, num_ow=24, M=64, img_size=(192, 256), nms_window=4,
              radius_pairs=False, channels=1):
    """radius_pairs: size the pair capacity for radius covisibility edges +
    one-way nearest+radius attachment (cfg.photo_construction thresholds
    > 0) instead of the temporal-only default.  channels: photometric
    channels for the mapping term (cfg.mapping.color)."""
    from como_tpu.odom.backend.pairs import max_pairs
    H, W = img_size
    return WindowDims(K=num_kf, O=num_ow, M=M, H=H, W=W,
                      ND=(H // nms_window) * (W // nms_window), L=num_kf * M,
                      P=max_pairs(num_kf, num_ow, radius_pairs), C=channels,
                      NW=nms_window)


class WindowState(NamedTuple):
    # keyframes
    kf_pose: jax.Array      # (K, 4, 4) T_wc
    kf_aff: jax.Array       # (K, 2)
    kf_valid: jax.Array     # (K,) bool, packed prefix
    kf_img: jax.Array       # (K, 3C, H, W) [I_c..., gx_c..., gy_c...]
    kf_rgb: jax.Array       # (K, 3, H, W) for viz / tracking reference
    cov_img: jax.Array      # (K, 3, H, W) packed GP covariance images
    # per-KF GP state
    Kmm_inv: jax.Array      # (K, M, M)
    L_mm: jax.Array         # (K, M, M)
    Knm_full: jax.Array     # (K, H*W, M) full-image predictor
    knm_colmean: jax.Array  # (K, M) column means of Knm_full (scale prior)
    # cached dense photometric sites (recomputed per KF insertion)
    dense_rc: jax.Array     # (K, ND, 2) float row/col coords
    dense_vals: jax.Array   # (K, C, ND) intensity values at sites
    dense_knm: jax.Array    # (K, ND, M) predictor rows at sites
    # anchors
    pm_first: jax.Array     # (K, M, 2) anchor pixel xy at first observation
    obs_ref: jax.Array      # (K, M) bool: first observed in this KF
    anchor_lm: jax.Array    # (K, M) int32 landmark slot of each anchor
    logzm: jax.Array        # (K, M) last projected anchor log-depths
    pm: jax.Array           # (K, M, 2) last projected anchor pixels (xy)
    median_depth: jax.Array  # (K,)
    # landmarks
    P_lm: jax.Array         # (L, 3) world points
    lm_valid: jax.Array     # (L,) bool
    # one-way frames
    ow_pose: jax.Array      # (O, 4, 4)
    ow_aff: jax.Array       # (O, 2)
    ow_valid: jax.Array     # (O,) bool, packed prefix
    ow_img: jax.Array       # (O, 3C, H, W)
    # gauge anchors / priors
    pose_anchor: jax.Array        # (4, 4) prior on oldest KF pose
    aff_anchor: jax.Array         # (2,)
    scale_anchor: jax.Array       # () mean-log-depth prior (pre-full window)
    window_full: jax.Array        # () bool
    P_anchor_vals: jax.Array      # (L, 3) frozen landmark targets
    P_anchor_mask: jax.Array      # (L,) bool


def empty_state(dims: WindowDims, dtype=jnp.float32) -> WindowState:
    K, O, M, H, W, ND, L = dims.K, dims.O, dims.M, dims.H, dims.W, dims.ND, dims.L
    C = dims.C
    eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (K, 4, 4))
    return WindowState(
        kf_pose=eye,
        kf_aff=jnp.zeros((K, 2), dtype),
        kf_valid=jnp.zeros((K,), bool),
        kf_img=jnp.zeros((K, 3 * C, H, W), dtype),
        kf_rgb=jnp.zeros((K, 3, H, W), dtype),
        cov_img=jnp.full((K, 3, H, W), 0.1, dtype),
        Kmm_inv=jnp.broadcast_to(jnp.eye(M, dtype=dtype), (K, M, M)),
        L_mm=jnp.broadcast_to(jnp.eye(M, dtype=dtype), (K, M, M)),
        Knm_full=jnp.zeros((K, H * W, M), dtype),
        knm_colmean=jnp.zeros((K, M), dtype),
        dense_rc=jnp.zeros((K, ND, 2), dtype),
        dense_vals=jnp.zeros((K, C, ND), dtype),
        dense_knm=jnp.zeros((K, ND, M), dtype),
        pm_first=jnp.zeros((K, M, 2), dtype),
        obs_ref=jnp.zeros((K, M), bool),
        anchor_lm=jnp.zeros((K, M), jnp.int32),
        logzm=jnp.zeros((K, M), dtype),
        pm=jnp.zeros((K, M, 2), dtype),
        median_depth=jnp.ones((K,), dtype),
        P_lm=jnp.zeros((L, 3), dtype),
        lm_valid=jnp.zeros((L,), bool),
        ow_pose=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (O, 4, 4)),
        ow_aff=jnp.zeros((O, 2), dtype),
        ow_valid=jnp.zeros((O,), bool),
        ow_img=jnp.zeros((O, 3 * C, H, W), dtype),
        pose_anchor=jnp.eye(4, dtype=dtype),
        aff_anchor=jnp.zeros((2,), dtype),
        scale_anchor=jnp.zeros((), dtype),
        window_full=jnp.asarray(False),
        P_anchor_vals=jnp.zeros((L, 3), dtype),
        P_anchor_mask=jnp.zeros((L,), bool),
    )


class LandmarkAllocator:
    """Host-side free-list for landmark slots (numpy, tiny)."""

    def __init__(self, L: int):
        self.L = L
        self.free = list(range(L - 1, -1, -1))
        self.valid = np.zeros(L, bool)

    def alloc(self, n: int) -> np.ndarray:
        assert len(self.free) >= n, "landmark slots exhausted"
        idx = np.array([self.free.pop() for _ in range(n)], np.int32)
        self.valid[idx] = True
        return idx

    def release(self, idx) -> None:
        for i in np.atleast_1d(idx):
            if self.valid[i]:
                self.valid[i] = False
                self.free.append(int(i))
