"""Tracking and mapping on *different* devices (reference como.yml:5,27
cuda:0/cuda:1 + transfer_data, ComoSeq.py:49-51, multiprocessing.py:41-46).

On the 8-device virtual CPU mesh: tracking on cpu:0, mapping on cpu:1.
Checks (a) stage arrays actually live on their devices, (b) the
two-device run produces bitwise the same trajectory as the same split
schedule on one device (device_put crossings are exact), and (c) the
pipeline runtime works cross-device too.
"""

import jax
import numpy as np
import pytest

from como_tpu.config import ComoConfig
from como_tpu.data.synthetic import SyntheticDataset
from como_tpu.runtime.placement import resolve_device, tree_device_put
from como_tpu.runtime.seq import ComoSeq

IMG = (48, 64)


def small_config(track_dev="cpu:0", map_dev="cpu:1"):
    cfg = ComoConfig()
    cfg.img_size = list(IMG)
    cfg.tracking.device = track_dev
    cfg.mapping.device = map_dev
    cfg.mapping.graph.num_keyframes = 4
    cfg.mapping.graph.num_one_way_frames = 4
    cfg.mapping.sampling.max_num_coords = 16
    cfg.mapping.sampling.border = 2
    cfg.mapping.init.max_iter = 30
    cfg.tracking.term_criteria.max_iter = 30
    return cfg.validate()


def run_seq(cfg, force_split=False):
    ds = SyntheticDataset(n_frames=20, img_size=IMG, seed=0, step=0.012)
    eng = ComoSeq(cfg, ds.intrinsics, IMG)
    if force_split:
        eng.split_devices = True
    eng.setup()
    ts, est = eng.run(ds)
    return eng, ts, est


def test_resolve_device():
    assert resolve_device(None) is None
    assert resolve_device("default") is None
    # a spec naming the PROCESS-DEFAULT device resolves to None: committed
    # placement only differs from the default by its jit-cache sharding
    # key, and that mismatch recompiled the insertion program mid-run
    # (placement.py resolve_device)
    assert resolve_device("cpu:0") is None
    d1 = resolve_device("cpu:1")
    assert d1 is not None and d1 == jax.devices("cpu")[1]
    # out-of-range index falls back to the platform's first device, which
    # here IS the default -> None
    assert resolve_device("cpu:99") is None
    # unavailable platform falls back to default
    assert resolve_device("tpu:1") is None


def test_tree_device_put_mixed():
    d1 = resolve_device("cpu:1")
    tree = ("keyframe", 1.25, jax.numpy.ones((3,)), [jax.numpy.zeros((2, 2))])
    out = tree_device_put(tree, d1)
    assert out[0] == "keyframe" and out[1] == 1.25
    assert out[2].devices() == {d1}
    assert out[3][0].devices() == {d1}


def test_seq_two_device_placement_and_equality():
    cpu0 = jax.devices("cpu")[0]  # the default (resolve_device -> None)
    cpu1 = resolve_device("cpu:1")

    eng2, ts2, est2 = run_seq(small_config("cpu:0", "cpu:1"))
    assert eng2.split_devices
    # stage state actually lives on the configured devices
    assert eng2.mapping.state.kf_pose.devices() == {cpu1}
    assert eng2.mapping.state.P_lm.devices() == {cpu1}
    assert eng2.tracking.levels[-1].vals.devices() == {cpu0}
    assert eng2.mapping.is_init
    assert np.all(np.isfinite(est2))

    # same split schedule, both stages on one device -> identical trajectory
    # (virtual CPU devices run the same binary; the transfers are exact)
    eng1, ts1, est1 = run_seq(small_config("cpu:0", "cpu:0"), force_split=True)
    assert not np.any(eng1.mapping.state.kf_pose.devices() == {cpu1})
    np.testing.assert_array_equal(np.asarray(ts1), np.asarray(ts2))
    np.testing.assert_allclose(est1, est2, rtol=0, atol=0)


def test_pipeline_two_device():
    from como_tpu.runtime.pipeline import ComoPipeline

    cpu1 = resolve_device("cpu:1")
    cfg = small_config("cpu:0", "cpu:1")
    ds = SyntheticDataset(n_frames=20, img_size=IMG, seed=0, step=0.012)
    eng = ComoPipeline(cfg, ds.intrinsics, IMG)
    eng.setup()
    for i in range(len(ds)):
        ts, rgb = ds[i]
        eng.step(float(ts), rgb)
    eng.shutdown()
    assert eng.mapping.is_init
    assert eng.mapping.state.kf_pose.devices() == {cpu1}
    assert len(eng.est_poses) > 3
    assert np.all(np.isfinite(np.stack(eng.est_poses)))
