import numpy as np

from como_tpu.viz import geometry as vg


def test_frustum():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    pts, lines = vg.frustum_lineset(np.eye(4), K, (48, 64), scale=0.2)
    assert pts.shape == (5, 3) and lines.shape == (8, 2)
    np.testing.assert_allclose(pts[0], 0.0)
    assert np.all(pts[1:, 2] > 0)


def test_trajectory():
    poses = np.tile(np.eye(4), (5, 1, 1))
    poses[:, 0, 3] = np.arange(5)
    pts, lines = vg.trajectory_lineset(poses)
    assert pts.shape == (5, 3) and lines.shape == (4, 2)


def test_normals_plane():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = np.full((48, 64), 2.0)   # frontoparallel plane
    n = vg.normals_from_depth(depth, K)
    inner = n[8:-8, 8:-8]
    assert np.abs(np.abs(inner[..., 2]) - 1.0).max() < 1e-6


def test_pointcloud_and_follow():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    rgbs = np.random.default_rng(0).uniform(size=(2, 3, 48, 64))
    depths = np.full((2, 1, 48, 64), 2.0)
    poses = np.tile(np.eye(4), (2, 1, 1))
    pts, cols = vg.keyframe_pointcloud(rgbs, depths, poses, K, stride=4)
    assert pts.shape == cols.shape[:1] + (3,)
    assert len(pts) == 2 * (48 // 4) * (64 // 4)
    Tf = vg.follow_camera_pose(np.eye(4))
    assert Tf[2, 3] < 0 and Tf[1, 3] < 0
