"""Stage -> device placement for the two-stage SLAM pipeline.

The reference runs tracking and mapping on *different CUDA devices*
(config/como.yml:5,27 "device: cuda:0/cuda:1") with explicit tensor
transfers at the stage boundary (como/utils/multiprocessing.py:41-46,
sequential/ComoSeq.py:49-51).  TPU equivalent: each stage's programs and
persistent arrays live on its own TPU core; keyframe-reference tensors
cross the boundary through jax.device_put — ICI on a multi-core chip /
host, transparently, on the CPU test mesh.

Device specs are strings "platform:index" ("tpu:1", "cpu:0"); an
unavailable platform or out-of-range index falls back to the default
device with a warning (a single-chip host can run a cuda:0/cuda:1-style
config unchanged, both stages just share the chip).
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax

log = logging.getLogger(__name__)

_PLATFORM_ALIASES = {"cuda": "tpu", "gpu": "tpu"}  # reference configs port 1:1


def resolve_device(spec: Optional[str]) -> Optional["jax.Device"]:
    """Device spec -> jax.Device, or None meaning "use the default".

    Returns None for empty/"default" specs.  Falls back (with a warning)
    to the first device of the requested platform if the index is out of
    range, and to None if the platform does not exist.
    """
    if not spec or spec == "default":
        return None
    platform, _, idx_s = spec.partition(":")
    platform = _PLATFORM_ALIASES.get(platform, platform)
    idx = int(idx_s) if idx_s else 0
    try:
        devs = jax.devices(platform)
    except RuntimeError:
        try:
            devs = [d for d in jax.devices() if d.platform == platform]
        except RuntimeError:
            devs = []
    if not devs:
        log.warning("device platform '%s' unavailable; using default", spec)
        return None
    if idx >= len(devs):
        log.warning("device '%s' out of range (%d available); using %s",
                    spec, len(devs), devs[0])
        devs = [devs[0]]
        idx = 0
    # A spec naming the process-default device resolves to None (= "use
    # the default", uncommitted): jit caches executables per argument
    # *sharding*, and committing inputs via device_put gives them a
    # different key than uncommitted ones — on a single-device engine the
    # first real keyframe insertion recompiled the (large) insertion
    # program a second time, 91 s on the 1-core host, because the warmup's
    # uncommitted dummy args and the runtime's committed args didn't share
    # a cache entry.  Committed placement is only meaningful when the
    # target differs from the default (two-device / split-stage configs).
    if devs[idx] == jax.devices()[0]:
        return None
    return devs[idx]


def resolve_stage_devices(track_spec: Optional[str],
                          map_spec: Optional[str]):
    """Resolve the two stage device specs together.

    Same target (including both-default) -> (None, None): fully
    uncommitted, one jit-cache sharding key everywhere (see
    resolve_device).  DIFFERENT targets -> both sides become explicit
    devices, because the stage-boundary transfers (tree_device_put) and
    default-device scopes are no-ops for None — a split engine with a
    None side would leak its arrays onto the other stage's device.
    """
    track = resolve_device(track_spec)
    map_ = resolve_device(map_spec)
    if track == map_:
        return track, map_
    default = jax.devices()[0]
    return track or default, map_ or default


def tree_device_put(tree: Any, device: Optional["jax.Device"]) -> Any:
    """Move every jax.Array leaf of a pytree to `device` (no-op if None).

    Host-side leaves (floats, strings) pass through untouched — queue
    messages mix device arrays with metadata.
    """
    if device is None:
        return tree

    def _move(x):
        if isinstance(x, jax.Array):
            return jax.device_put(x, device)
        return x

    return jax.tree.map(_move, tree)


class device_scope:
    """Context manager pinning jax's default device (no-op for None)."""

    def __init__(self, device: Optional["jax.Device"]):
        self._device = device
        self._ctx = None

    def __enter__(self):
        if self._device is not None:
            self._ctx = jax.default_device(self._device)
            self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        if self._ctx is not None:
            return self._ctx.__exit__(*exc)
        return False
