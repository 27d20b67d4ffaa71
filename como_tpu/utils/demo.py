"""Demo window states: fill a WindowState from the synthetic scene with
ground-truth geometry, without running the full engine.  Used by the
graft entry points and benchmarks (realistic shapes + numerically sane
content).  No reference-code counterpart — the reference has no test or
benchmark fixtures at all (SURVEY.md section 4)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from como_tpu.data.synthetic import PlaneScene
from como_tpu.geometry import lie
from como_tpu.net.analytic_prior import cov_params_from_rgb
from como_tpu.odom import window as win
from como_tpu.odom.backend import pairs as pairs_mod
from como_tpu.odom.mapping import prep_keyframe


def anchor_grid(img_size, M):
    """~sqrt(M) x sqrt(M) uniform anchor grid, (M, 2) xy pixels."""
    H, W = img_size
    n = int(np.ceil(np.sqrt(M)))
    ys = np.linspace(8, H - 9, n)
    xs = np.linspace(8, W - 9, n)
    g = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)[:M]
    return jnp.array(g, jnp.float32)


def make_demo_state(dims: win.WindowDims, num_kf: int = 3, num_ow: int = 2,
                    seed: int = 0, step: float = 0.03,
                    scene_kwargs: dict | None = None, channels: int = 1):
    """WindowState with num_kf keyframes + num_ow one-way frames rendered
    from the synthetic plane scene at ground truth.  Returns
    (state, pair arrays, intrinsics).  channels must match dims.C
    (mapping.color: gray=1, rgb=3); scene_kwargs are forwarded to
    PlaneScene (e.g. chroma=True)."""
    assert channels == dims.C, (channels, dims.C)
    img_size = (dims.H, dims.W)
    scene = PlaneScene(img_size=img_size, seed=seed, **(scene_kwargs or {}))
    K_intr = scene.K
    M = dims.M
    st = win.empty_state(dims)
    axy = anchor_grid(img_size, M)
    kf_ts, ow_ts = [], []

    rng = np.random.default_rng(seed)
    t = 0.0
    for k in range(num_kf):
        xi = np.zeros(6, np.float32)
        xi[3] = step * k
        xi[1] = 0.01 * k
        pose = lie.se3_exp(jnp.array(xi))
        rgb, depth = scene.render(pose)
        cov = cov_params_from_rgb(rgb)
        prep = prep_keyframe(rgb, cov, axy, K_intr, 1.0, 4, C=channels)
        z = jax.vmap(lambda p: depth[0, 0, p[1].astype(int), p[0].astype(int)])(axy)
        logzm = jnp.log(z)
        ray = jnp.stack([(axy[:, 0] - K_intr[0, 2]) / K_intr[0, 0],
                         (axy[:, 1] - K_intr[1, 2]) / K_intr[1, 1],
                         jnp.ones((M,))], -1)
        Pw = jnp.einsum("ij,mj->mi", pose[:3, :3], z[:, None] * ray) + pose[:3, 3]
        lm = jnp.arange(k * M, (k + 1) * M, dtype=jnp.int32)
        st = st._replace(
            kf_pose=st.kf_pose.at[k].set(pose),
            kf_valid=st.kf_valid.at[k].set(True),
            kf_img=st.kf_img.at[k].set(prep["iag"]),
            kf_rgb=st.kf_rgb.at[k].set(rgb[0]),
            cov_img=st.cov_img.at[k].set(cov),
            Kmm_inv=st.Kmm_inv.at[k].set(prep["Kmm_inv"]),
            L_mm=st.L_mm.at[k].set(prep["L_mm"]),
            Knm_full=st.Knm_full.at[k].set(prep["Knm_full"]),
            knm_colmean=st.knm_colmean.at[k].set(prep["knm_colmean"]),
            dense_rc=st.dense_rc.at[k].set(prep["dense_rc"]),
            dense_vals=st.dense_vals.at[k].set(prep["dense_vals"]),
            dense_knm=st.dense_knm.at[k].set(prep["dense_knm"]),
            pm_first=st.pm_first.at[k].set(axy),
            pm=st.pm.at[k].set(axy),
            obs_ref=st.obs_ref.at[k].set(jnp.ones((M,), bool)),
            anchor_lm=st.anchor_lm.at[k].set(lm),
            logzm=st.logzm.at[k].set(logzm),
            median_depth=st.median_depth.at[k].set(jnp.median(z)),
            P_lm=st.P_lm.at[lm].set(Pw),
            lm_valid=st.lm_valid.at[lm].set(True),
        )
        kf_ts.append(t)
        t += 0.2

    t_ow = 0.1
    for j in range(num_ow):
        xi = np.zeros(6, np.float32)
        xi[3] = step * (j + 0.5)
        pose = lie.se3_exp(jnp.array(xi))
        rgb, _ = scene.render(pose)
        from como_tpu.odom.mapping import _prep_ow_img
        iag = _prep_ow_img(rgb, channels)
        st = st._replace(
            ow_pose=st.ow_pose.at[j].set(pose),
            ow_valid=st.ow_valid.at[j].set(True),
            ow_img=st.ow_img.at[j].set(iag),
        )
        ow_ts.append(t_ow)
        t_ow += 0.2

    # scale anchor convention: mean *predicted dense* log-depth of KF0
    # (= colmean(Knm_full) . logzm), matching the SfM bootstrap
    st = st._replace(pose_anchor=st.kf_pose[0],
                     scale_anchor=jnp.dot(st.knm_colmean[0], st.logzm[0]))
    pb = pairs_mod.build_pairs(num_kf, kf_ts, ow_ts, dims.K, dims.P)
    pairs = (jnp.array(pb.ref_kf), jnp.array(pb.target_slot), jnp.array(pb.valid))
    return st, pairs, K_intr
