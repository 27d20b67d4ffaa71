"""Long-sequence stability: many keyframe window shifts, one-way pruning
cycles and landmark slot reuse must not leak, exhaust, or corrupt state."""

import numpy as np
import pytest

from como_tpu.config import ComoConfig
from como_tpu.data.synthetic import SyntheticDataset
from como_tpu.runtime.seq import ComoSeq
from como_tpu.utils.io import ate_rmse

IMG = (48, 64)


@pytest.mark.slow
def test_long_sequence_stability():
    cfg = ComoConfig()
    cfg.img_size = list(IMG)
    cfg.mapping.graph.num_keyframes = 4
    cfg.mapping.graph.num_one_way_frames = 5
    cfg.mapping.sampling.max_num_coords = 16
    cfg.mapping.sampling.border = 2
    cfg.validate()

    ds = SyntheticDataset(n_frames=100, img_size=IMG, seed=3, step=0.015)
    eng = ComoSeq(cfg, ds.intrinsics, IMG)
    eng.setup()
    ts, est = eng.run(ds)

    m = eng.mapping
    assert m.is_init
    assert m.num_kf == 4                       # window cycled many times
    # allocator invariants: valid set matches the referenced set
    referenced = np.unique(m.anchor_lm_host[: m.num_kf])
    valid = np.where(m.alloc.valid)[0]
    assert set(referenced.tolist()) == set(valid.tolist())
    assert len(valid) + len(m.alloc.free) == m.dims.L
    # device mirror agrees
    lm_valid_dev = np.array(m.state.lm_valid)
    assert set(np.where(lm_valid_dev)[0].tolist()) == set(valid.tolist())

    assert np.all(np.isfinite(est))
    idx = (np.asarray(ts) * 30.0).round().astype(int)
    gt = np.array(ds.poses)[idx]
    ate = ate_rmse(est, gt, with_scale=True)
    assert ate < 0.06, f"long-run ATE {ate}"
