"""Config layer, trajectory IO + ATE, checkpoint/resume, renderer."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from como_tpu.config import ComoConfig, load_config
from como_tpu.geometry import lie
from como_tpu.utils.io import ate_rmse, load_traj, save_traj, umeyama_align


def test_config_defaults_and_yaml(tmp_path):
    cfg = load_config("configs/como.yml")
    assert cfg.mapping.graph.num_keyframes == 9
    assert cfg.mapping.sampling.max_num_coords == 64
    assert cfg.tracking.keyframing.kf_depth_motion_ratio == 0.12

    p = tmp_path / "o.yml"
    p.write_text("mapping:\n  graph:\n    num_keyframes: 5\n")
    cfg2 = load_config(str(p))
    assert cfg2.mapping.graph.num_keyframes == 5

    bad = tmp_path / "bad.yml"
    bad.write_text("mapping:\n  nonexistent_key: 1\n")
    with pytest.raises(KeyError):
        load_config(str(bad))


def test_every_shipped_preset_loads():
    """Every shipped ComoConfig preset must load over the defaults and
    pass validation (viz.yml / realsense.yml are viewer/sensor configs,
    not ComoConfig overlays).  Since round 5 the keyframing-robustness
    settings (promote + stat_ema + auto anticipate) are the DEFAULTS;
    longrun.yml only tightens the dispatch depth."""
    for name in ("como.yml", "mesh.yml", "longrun.yml"):
        cfg = load_config(os.path.join("configs", name))
        assert cfg.img_size == [192, 256], name
        assert cfg.tracking.keyframing.kf_promote_latest, name
        assert cfg.tracking.keyframing.stat_ema == 0.5, name
        assert cfg.tracking.keyframing.kf_anticipate == -1, name
    lr = load_config("configs/longrun.yml")
    assert lr.dispatch_depth == 2


def test_traj_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    T = np.array(lie.se3_exp(jnp.array(rng.normal(size=(7, 6)) * 0.5,
                                       jnp.float32)))
    ts = np.arange(7) / 30.0
    f = str(tmp_path / "traj.txt")
    save_traj(f, ts, T)
    ts2, T2 = load_traj(f)
    np.testing.assert_allclose(ts, ts2, atol=1e-3)
    np.testing.assert_allclose(T, T2, atol=1e-3)


def test_umeyama_and_ate():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(50, 3))
    R_true = np.array(lie.so3_exp(jnp.array([0.3, -0.2, 0.5])))
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    dst = s_true * src @ R_true.T + t_true
    s, R, t = umeyama_align(src, dst)
    assert abs(s - s_true) < 1e-5
    np.testing.assert_allclose(R, R_true, atol=1e-6)

    # build pose arrays: ATE after alignment must be ~0
    def poses(p):
        T = np.tile(np.eye(4), (len(p), 1, 1))
        T[:, :3, 3] = p
        return T
    assert ate_rmse(poses(src), poses(dst)) < 1e-6


def test_checkpoint_roundtrip(tmp_path):
    from como_tpu.config import ComoConfig
    from como_tpu.data.synthetic import SyntheticDataset
    from como_tpu.runtime.seq import ComoSeq
    from como_tpu.utils.checkpoint import load_mapping_state, save_mapping_state

    IMG = (48, 64)
    cfg = ComoConfig()
    cfg.img_size = list(IMG)
    cfg.mapping.graph.num_keyframes = 4
    cfg.mapping.graph.num_one_way_frames = 4
    cfg.mapping.sampling.max_num_coords = 16
    cfg.mapping.sampling.border = 2
    cfg.validate()
    ds = SyntheticDataset(n_frames=18, img_size=IMG, seed=0, step=0.012)
    eng = ComoSeq(cfg, ds.intrinsics, IMG)
    eng.setup()
    eng.run(ds)
    assert eng.mapping.is_init

    path = str(tmp_path / "state.ckpt")
    save_mapping_state(eng.mapping, path)

    eng2 = ComoSeq(cfg, ds.intrinsics, IMG)
    eng2.setup()
    load_mapping_state(eng2.mapping, path)
    assert eng2.mapping.num_kf == eng.mapping.num_kf
    np.testing.assert_allclose(np.array(eng2.mapping.state.kf_pose),
                               np.array(eng.mapping.state.kf_pose))
    # resumed mapping can keep iterating
    stats = eng2.mapping.iterate()
    assert np.isfinite(float(stats.total_err))


def test_renderer_smoke():
    from como_tpu.data.synthetic import PlaneScene
    from como_tpu.viz.renderer import render_map

    scene = PlaneScene(img_size=(48, 64), seed=0)
    rgb, depth = scene.render(jnp.eye(4))
    img, dep = render_map(rgb, depth, jnp.eye(4)[None], jnp.ones((1,), bool),
                          scene.K, jnp.eye(4), out_size=(48, 64), splat=2)
    img = np.array(img)
    assert img.shape == (48, 64, 3)
    # rendering the cloud from the same camera reproduces the image closely
    src = np.array(rgb[0].transpose(1, 2, 0))
    filled = np.array(dep) > 0
    assert filled.mean() > 0.9
    diff = np.abs(img - src)[filled]
    assert np.median(diff) < 0.05
