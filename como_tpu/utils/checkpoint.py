"""SLAM-state snapshot / resume.

The reference has no state checkpointing (SURVEY.md section 5.4: only the
network ckpt + trajectory export).  Here the full sliding-window pytree
plus host bookkeeping serializes to one msgpack file, so a session can be
stopped and resumed mid-sequence (and crash recovery for the pipelined
runtime becomes possible).
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np
from flax import serialization

from como_tpu.odom.window import WindowState


def save_mapping_state(mapping, path: str) -> None:
    """Snapshot a Mapping object's device state + host bookkeeping."""
    state_bytes = serialization.to_bytes(mapping.state._asdict())
    meta = dict(
        kf_ts=mapping.kf_ts, ow_ts=mapping.ow_ts,
        num_kf=mapping.num_kf, num_ow=mapping.num_ow,
        anchor_lm=mapping.anchor_lm_host.tolist(),
        alloc_valid=mapping.alloc.valid.tolist(),
        alloc_free=mapping.alloc.free,
        is_init=mapping.is_init,
    )
    with open(path, "wb") as f:
        header = json.dumps(meta).encode()
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(state_bytes)


def load_mapping_state(mapping, path: str) -> None:
    """Restore a snapshot into a set-up Mapping object (same config)."""
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(n).decode())
        state_dict = serialization.from_bytes(
            mapping.state._asdict(), f.read())
    mapping.state = WindowState(**{
        k: jnp.asarray(v) for k, v in state_dict.items()})
    mapping.kf_ts = list(meta["kf_ts"])
    mapping.ow_ts = list(meta["ow_ts"])
    mapping.num_kf = int(meta["num_kf"])
    mapping.num_ow = int(meta["num_ow"])
    mapping.anchor_lm_host = np.array(meta["anchor_lm"], np.int32)
    mapping.alloc.valid = np.array(meta["alloc_valid"], bool)
    mapping.alloc.free = list(meta["alloc_free"])
    mapping.is_init = bool(meta["is_init"])
    if mapping.is_init:
        mapping._rebuild_pairs()
