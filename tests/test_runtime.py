"""Queues (native + fallback) and the pipelined runtime."""

import threading
import time

import numpy as np
import pytest

from como_tpu.runtime import queues as q_mod


@pytest.fixture(params=["native", "python"])
def queue_factory(request):
    if request.param == "native":
        try:
            q = q_mod.NativeQueue(4)
        except Exception:
            pytest.skip("native runtime unavailable")
        return lambda n=4: q_mod.NativeQueue(n)
    return lambda n=4: q_mod.PyQueue(n)


def test_fifo(queue_factory):
    q = queue_factory(4)
    for i in range(3):
        q.push(("msg", i))
    assert q.pop()[1] == 0
    assert q.pop()[1] == 1
    assert q.qsize() == 1


def test_drop_stale_push(queue_factory):
    q = queue_factory(2)
    for i in range(5):
        q.push(i, block=False)
    assert q.qsize() == 2
    assert q.pop() == 3
    assert q.pop() == 4


def test_pop_until_latest(queue_factory):
    q = queue_factory(4)
    for i in range(4):
        q.push(i)
    assert q.pop_until_latest() == 3
    assert q.qsize() == 0
    assert q.pop_until_latest(timeout=0.01) is None


def test_blocking_producer_consumer(queue_factory):
    q = queue_factory(2)
    got = []

    def consumer():
        while True:
            v = q.pop(timeout=2.0)
            if v is None or v == "end":
                break
            got.append(v)

    t = threading.Thread(target=consumer)
    t.start()
    for i in range(20):
        assert q.push(i, block=True, timeout=2.0)
    q.push("end")
    t.join(5.0)
    assert got == list(range(20))


def test_pipeline_end_to_end():
    """Full pipelined SLAM on the tiny synthetic scene."""
    from como_tpu.config import ComoConfig
    from como_tpu.data.synthetic import SyntheticDataset
    from como_tpu.runtime.pipeline import ComoPipeline

    IMG = (48, 64)
    cfg = ComoConfig()
    cfg.img_size = list(IMG)
    cfg.mapping.graph.num_keyframes = 4
    cfg.mapping.graph.num_one_way_frames = 4
    cfg.mapping.sampling.max_num_coords = 16
    cfg.mapping.sampling.border = 2
    cfg.validate()

    ds = SyntheticDataset(n_frames=20, img_size=IMG, seed=0, step=0.012)
    eng = ComoPipeline(cfg, ds.intrinsics, IMG)
    eng.setup()
    for i in range(len(ds)):
        ts, rgb = ds[i]
        eng.step(float(ts), rgb)
        time.sleep(0.01)  # let the 1-core host interleave the threads
    eng.shutdown()
    assert eng.mapping.is_init
    assert len(eng.est_poses) > 5
    assert np.all(np.isfinite(np.stack(eng.est_poses)))


def test_dispatch_depth_matches_depth1():
    """cfg.dispatch_depth pipelines decisions N frames behind dispatch;
    deeper depth must still converge to a close trajectory (measured on
    TPU: unchanged ATE at 2, see NOTES_ROUND2)."""
    from como_tpu.config import ComoConfig
    from como_tpu.data.synthetic import SyntheticDataset
    from como_tpu.runtime.seq import ComoSeq
    from como_tpu.utils.io import ate_rmse

    IMG = (48, 64)
    ates = {}
    for depth in (1, 2):
        cfg = ComoConfig()
        cfg.img_size = list(IMG)
        cfg.dispatch_depth = depth
        cfg.mapping.graph.num_keyframes = 4
        cfg.mapping.graph.num_one_way_frames = 4
        cfg.mapping.sampling.max_num_coords = 16
        cfg.mapping.sampling.border = 2
        cfg.validate()
        ds = SyntheticDataset(n_frames=25, img_size=IMG, seed=0, step=0.02)
        eng = ComoSeq(cfg, ds.intrinsics, IMG)
        eng.setup()
        ts, est = eng.run(ds)
        assert np.all(np.isfinite(est))
        idx = (np.asarray(ts) * 30.0).round().astype(int)
        ates[depth] = ate_rmse(est, np.array(ds.poses)[idx], with_scale=True)
    assert ates[2] < max(2.5 * ates[1], 0.02), ates


def test_resolve_stride_matches_stride1():
    """cfg.resolve_stride batches decision resolution: one burst resolves
    `stride` pending frames every stride-th frame (amortizing the
    per-frame decision-stats sync, the profiled frame-loop floor on a
    remote-attached TPU).  Decisions land at fixed alternating depths, so
    the trajectory must stay close to stride 1 AND be bitwise identical
    across repeat runs (the determinism the deleted adaptive-lag knob
    lacked)."""
    from como_tpu.config import ComoConfig
    from como_tpu.data.synthetic import SyntheticDataset
    from como_tpu.runtime.seq import ComoSeq
    from como_tpu.utils.io import ate_rmse

    IMG = (48, 64)

    def run(stride):
        cfg = ComoConfig()
        cfg.img_size = list(IMG)
        cfg.dispatch_depth = 2
        cfg.resolve_stride = stride
        cfg.mapping.graph.num_keyframes = 4
        cfg.mapping.graph.num_one_way_frames = 4
        cfg.mapping.sampling.max_num_coords = 16
        cfg.mapping.sampling.border = 2
        cfg.validate()
        ds = SyntheticDataset(n_frames=25, img_size=IMG, seed=0, step=0.02)
        eng = ComoSeq(cfg, ds.intrinsics, IMG)
        eng.setup()
        ts, est = eng.run(ds)
        assert np.all(np.isfinite(est))
        idx = (np.asarray(ts) * 30.0).round().astype(int)
        return est, ate_rmse(est, np.array(ds.poses)[idx], with_scale=True)

    est1, ate1 = run(1)
    est2, ate2 = run(2)
    est2b, ate2b = run(2)
    np.testing.assert_array_equal(est2, est2b)  # deterministic by design
    assert ate2 < max(2.5 * ate1, 0.02), (ate1, ate2)


def test_frame_batch_matches_unbatched():
    """cfg.frame_batch=2 tracks two consecutive frames (second seeded
    from the first's on-device pose, shared KF reference) + two mapping
    GN steps in ONE device program — halving programs/frame, the
    remote-attachment throughput lever.  Every frame must still get a
    pose (odd frame count exercises the stash flush in finish()), the
    trajectory must stay close to the unbatched depth-2 run, and repeat
    runs must be bitwise identical (decisions resolve at fixed pair
    depths {2,3}, never by transport timing)."""
    from como_tpu.config import ComoConfig
    from como_tpu.data.synthetic import SyntheticDataset
    from como_tpu.runtime.seq import ComoSeq
    from como_tpu.utils.io import ate_rmse

    IMG = (48, 64)
    N = 25  # odd number of post-init frames -> stash flush path

    def run(batch):
        cfg = ComoConfig()
        cfg.img_size = list(IMG)
        cfg.dispatch_depth = 2
        cfg.frame_batch = batch
        cfg.mapping.graph.num_keyframes = 4
        cfg.mapping.graph.num_one_way_frames = 4
        cfg.mapping.sampling.max_num_coords = 16
        cfg.mapping.sampling.border = 2
        cfg.validate()
        ds = SyntheticDataset(n_frames=N, img_size=IMG, seed=0, step=0.02)
        eng = ComoSeq(cfg, ds.intrinsics, IMG)
        eng.setup()
        ts, est = eng.run(ds)
        assert np.all(np.isfinite(est))
        # every frame from init onward is accounted for exactly once
        assert len(ts) == len(set(ts)) and len(est) == len(ts)
        idx = (np.asarray(ts) * 30.0).round().astype(int)
        return (len(ts), est,
                ate_rmse(est, np.array(ds.poses)[idx], with_scale=True))

    n1, est1, ate1 = run(1)
    n2, est2, ate2 = run(2)
    n2b, est2b, ate2b = run(2)
    assert n2 == n1  # batching drops no frames
    np.testing.assert_array_equal(est2, est2b)  # deterministic by design
    assert ate2 < max(2.5 * ate1, 0.02), (ate1, ate2)


def test_warm_start_identical_trajectory():
    """mapping.warm_start executes dummy insertion-path programs at setup
    and restores state bitwise — trajectories (and insertion decisions)
    must be IDENTICAL to a cold engine; only first-insertion latency may
    differ (the 1-2.5 s first-touch stall it exists to move)."""
    from como_tpu.config import ComoConfig
    from como_tpu.data.synthetic import SyntheticDataset
    from como_tpu.runtime.seq import ComoSeq

    IMG = (48, 64)

    def run(warm):
        cfg = ComoConfig()
        cfg.img_size = list(IMG)
        cfg.mapping.warm_start = warm
        cfg.mapping.graph.num_keyframes = 4
        cfg.mapping.graph.num_one_way_frames = 4
        cfg.mapping.sampling.max_num_coords = 16
        cfg.mapping.sampling.border = 2
        cfg.validate()
        ds = SyntheticDataset(n_frames=20, img_size=IMG, seed=0, step=0.02)
        eng = ComoSeq(cfg, ds.intrinsics, IMG)
        eng.setup()
        ts, est = eng.run(ds)
        return ts, est, eng.mapping.kf_ts, eng.mapping.ow_ts

    ts_c, est_c, kf_c, ow_c = run(False)
    ts_w, est_w, kf_w, ow_w = run(True)
    np.testing.assert_array_equal(ts_c, ts_w)
    np.testing.assert_array_equal(est_c, est_w)   # bitwise restore
    assert kf_c == kf_w and ow_c == ow_w


def test_frame_batch_validation():
    from como_tpu.config import ComoConfig
    cfg = ComoConfig()
    cfg.frame_batch = 2
    cfg.dispatch_depth = 3  # pair resolution needs an even depth
    with pytest.raises(AssertionError):
        cfg.validate()
    cfg.dispatch_depth = 2
    cfg.resolve_stride = 2  # batching already bursts per pair
    with pytest.raises(AssertionError):
        cfg.validate()
    cfg.resolve_stride = 1
    cfg.validate()
