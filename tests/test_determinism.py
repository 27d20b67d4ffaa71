"""Bitwise reproducibility: the reference documents its Hessian
scatter_add_ as nondeterministic (linear_system.py:11,17); our anchor-
space assembly is deterministic by construction.  Two identical runs must
produce bit-identical trajectories and map state."""

import numpy as np

from como_tpu.config import ComoConfig
from como_tpu.data.synthetic import SyntheticDataset
from como_tpu.runtime.seq import ComoSeq

IMG = (48, 64)


def _run():
    cfg = ComoConfig()
    cfg.img_size = list(IMG)
    cfg.mapping.graph.num_keyframes = 4
    cfg.mapping.graph.num_one_way_frames = 4
    cfg.mapping.sampling.max_num_coords = 16
    cfg.mapping.sampling.border = 2
    cfg.validate()
    ds = SyntheticDataset(n_frames=20, img_size=IMG, seed=0, step=0.012)
    eng = ComoSeq(cfg, ds.intrinsics, IMG)
    eng.setup()
    ts, est = eng.run(ds)
    st = eng.mapping.state
    return est, np.array(st.P_lm), np.array(st.kf_pose)


def test_bitwise_reproducible():
    est1, P1, pose1 = _run()
    est2, P2, pose2 = _run()
    np.testing.assert_array_equal(est1, est2)
    np.testing.assert_array_equal(P1, P2)
    np.testing.assert_array_equal(pose1, pose2)


def test_radius_covisibility_edges():
    from como_tpu.odom.backend.pairs import build_pairs, radius_kf_edges
    import numpy as np

    poses = np.tile(np.eye(4), (4, 1, 1))
    poses[1, :3, 3] = [0.05, 0, 0]
    poses[2, :3, 3] = [5.0, 0, 0]      # far away
    poses[3, :3, 3] = [0.02, 0.02, 0]
    med = np.ones(4)
    edges = radius_kf_edges(poses, med, radius_thresh=0.5, degrees_thresh=30.0)
    # non-consecutive near pairs only: (0,3)? |i-j|>1 required
    assert (0, 2) not in edges and (2, 0) not in edges
    assert (0, 3) in edges and (3, 0) in edges

    pb = build_pairs(4, [0.0, 0.1, 0.2, 0.3], [0.05], K_slots=4, P_max=20,
                     poses=poses, median_depths=med,
                     radius_thresh=0.5, degrees_thresh=30.0)
    n_valid = int(pb.valid.sum())
    assert n_valid >= 2 * 3 + 1  # fwd/bwd chains + ow attachment (+radius)
