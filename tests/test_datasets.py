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


def make_scannet(tmp_path, n=3):
    """ScanNet-style directory fixture (reference odom_datasets.py:154-261):
    color/*.jpg + <scene>.txt info file with ' = '-separated calibration."""
    scene = tmp_path / "scene0000_00"
    color = scene / "color"
    os.makedirs(color)
    rng = np.random.default_rng(2)
    for i in range(n):
        cv2.imwrite(str(color / f"{i}.jpg"),
                    rng.integers(0, 255, (968, 1296, 3), dtype=np.uint8))
    with open(scene / "scene0000_00.txt", "w") as f:
        f.write("colorHeight = 968\ncolorWidth = 1296\n"
                "fx_color = 1170.2\nfy_color = 1170.2\n"
                "mx_color = 647.75\nmy_color = 483.75\n"
                "numColorFrames = {}\n".format(n))
    return str(scene)


def test_scannet_loader(tmp_path):
    from como_tpu.data.datasets import ScanNetDataset

    ds = ScanNetDataset(make_scannet(tmp_path), (192, 256), crop_size=8)
    assert len(ds) == 3
    ts, rgb = ds[2]
    assert abs(ts - 2 / 30.0) < 1e-9
    assert rgb.shape == (1, 3, 192, 256)
    K = np.array(ds.intrinsics)
    # intrinsics chain: storage 480x640 -> crop 8 -> resize 192x256,
    # each resize in the reference's half-pixel-absorbing convention
    # (resize_intrinsics: cx' = sx*(cx+1), fx' = sx*fx)
    sx1, sx2 = 640.0 / 1296.0, 256.0 / (640 - 16)
    fx_480 = 1170.2 * sx1
    assert abs(K[0, 0] - fx_480 * sx2) < 1e-3
    cx_480 = sx1 * (647.75 + 1.0)
    assert abs(K[0, 2] - sx2 * (cx_480 - 8 + 1.0)) < 1e-3
    assert ds.save_traj_name == "scene0000_00"


def test_tum_fr1_distortion_branch(tmp_path):
    """fr1 calibration carries plumb-bob distortion: the loader must build
    undistort-rectify maps (reference odom_datasets.py:59-130) and remap
    every frame through them."""
    seq = tmp_path / "rgbd_dataset_freiburg1_test"
    rgb_dir = seq / "rgb"
    os.makedirs(rgb_dir)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    cv2.imwrite(str(rgb_dir / "0.png"), img)
    with open(seq / "rgb.txt", "w") as f:
        f.write("# a\n# b\n# c\n0.0000 rgb/0.png\n")
    ds = TumDataset(str(seq) + "/", (192, 256))
    assert ds.map1 is not None and ds.map2 is not None
    _, rgb = ds[0]
    assert rgb.shape == (1, 3, 192, 256)


def test_tum_undistort_map_parity():
    """Geometry parity of the undistortion maps: for a pixel p in the
    rectified image, map1/map2 give the source pixel in the distorted
    image; that source must equal OpenCV's forward distortion model
    applied to the ray K_new^-1 p (the exact construction the reference
    relies on, odom_datasets.py:79-84)."""
    from como_tpu.data.datasets import _TUM_CALIB

    K0, dist = _TUM_CALIB[1]
    wh = (640, 480)
    K_new, _ = cv2.getOptimalNewCameraMatrix(K0, dist, wh, alpha=0,
                                             newImgSize=wh)
    map1, map2 = cv2.initUndistortRectifyMap(K0, dist, None, K_new, wh,
                                             cv2.CV_32FC1)
    rng = np.random.default_rng(4)
    for _ in range(20):
        u = rng.integers(40, 600)
        v = rng.integers(40, 440)
        ray = np.linalg.inv(K_new) @ np.array([u, v, 1.0])
        proj, _ = cv2.projectPoints(ray[None, None, :], np.zeros(3),
                                    np.zeros(3), K0, dist)
        src = np.array([map1[v, u], map2[v, u]])
        assert np.allclose(src, proj[0, 0], atol=0.3), (src, proj[0, 0])


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
