"""Dataset loaders on fabricated mini-datasets (no external data needed)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from como_tpu.data.datasets import ReplicaDataset, TumDataset, get_dataset


def make_tum(tmp_path):
    seq = tmp_path / "rgbd_dataset_freiburg2_test" / ""
    rgb_dir = tmp_path / "rgbd_dataset_freiburg2_test" / "rgb"
    os.makedirs(rgb_dir)
    lines = ["# header\n", "# header\n", "# header\n"]
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        cv2.imwrite(str(rgb_dir / f"{i}.png"), img)
        lines.append(f"{i / 30.0:.4f} rgb/{i}.png\n")
    with open(tmp_path / "rgbd_dataset_freiburg2_test" / "rgb.txt", "w") as f:
        f.writelines(lines)
    return str(tmp_path / "rgbd_dataset_freiburg2_test") + "/"


def test_tum_loader(tmp_path):
    path = make_tum(tmp_path)
    ds = TumDataset(path, (192, 256))
    assert len(ds) == 4
    ts, rgb = ds[0]
    assert ts == 0.0
    assert rgb.shape == (1, 3, 192, 256)
    assert 0.0 <= float(rgb.min()) and float(rgb.max()) <= 1.0
    K = np.array(ds.intrinsics)
    assert K[0, 0] > 100 and abs(K[2, 2] - 1.0) < 1e-6


def test_replica_loader(tmp_path):
    res = tmp_path / "room0" / "results"
    os.makedirs(res)
    rng = np.random.default_rng(1)
    for i in range(3):
        cv2.imwrite(str(res / f"frame{i:06d}.jpg"),
                    rng.integers(0, 255, (680, 1200, 3), dtype=np.uint8))
    ds = ReplicaDataset(str(tmp_path / "room0"), (192, 256))
    assert len(ds) == 3
    ts, rgb = ds[1]
    assert abs(ts - 1 / 30.0) < 1e-9
    assert rgb.shape == (1, 3, 192, 256)


def test_factory_synthetic():
    ds = get_dataset("synthetic", (48, 64), n_frames=5)
    assert len(ds) == 5
    ts, rgb = ds[0]
    assert rgb.shape == (1, 3, 48, 64)


def test_random_uniform_sampler():
    import jax
    import jax.numpy as jnp

    from como_tpu.gp.sampler import random_uniform_sample

    valid = jnp.arange(100) % 2 == 0  # 50 valid sites
    idx, ok = random_uniform_sample(jax.random.PRNGKey(0), valid, 16)
    assert bool(ok.all())
    assert len(set(np.array(idx).tolist())) == 16
    assert np.all(np.array(idx) % 2 == 0)
