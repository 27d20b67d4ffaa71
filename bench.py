"""Benchmark: runs on the real TPU chip; prints ONE JSON line.

Primary metric: tracking throughput (FPS) of the full pyramid IC solve at
the reference working resolution (192x256, levels 0-2, all-pixel sample
sites) — the reference's headline "real-time" claim (>= 30 FPS target,
BASELINE.md).  Also measures the mapping GN iteration latency at full
problem size (9 KF + 24 OW, 64 anchors, 3072 dense sites/KF; <= 50 ms
target) and folds both into the headline ratio.
"""

import json
import time

import numpy as np


def time_fn(fn, *args, warmup=2, iters=20):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax  # host-keyed persistent compile cache is set by the package
    import jax.numpy as jnp

    from como_tpu.config import TrackingConfig
    from como_tpu.data.synthetic import PlaneScene
    from como_tpu.geometry import lie
    from como_tpu.odom import tracking as tr
    from como_tpu.odom.backend.gn_step import SigmaStatic, gn_step
    from como_tpu.odom.frontend import tracking_kernels as tk
    from como_tpu.odom.window import make_dims
    from como_tpu.ops import image as img_ops
    from como_tpu.utils.demo import make_demo_state

    img_size = (192, 256)
    scene = PlaneScene(img_size=img_size, seed=0)

    # ---- tracking FPS -------------------------------------------------------
    cfg = TrackingConfig()
    t = tr.Tracking(cfg=cfg, intrinsics=scene.K, img_size=img_size)
    t.setup()
    rgb0, depth0 = scene.render(jnp.eye(4))
    t.update_kf_reference(([0.0], rgb0, jnp.eye(4)[None],
                           jnp.zeros((1, 2)), depth0))
    T1 = lie.se3_exp(jnp.array([0.004, -0.003, 0.002, 0.01, -0.006, 0.004]))
    rgb1, _ = scene.render(T1)
    gray = img_ops.rgb_to_gray(rgb1)
    pyr = img_ops.image_pyramid(gray, cfg.pyr.start_level, cfg.pyr.end_level)

    def track_once(Tinit, aff):
        return tk.track_pyramid(t.levels, pyr, Tinit, aff, t.term)

    dt_track = time_fn(track_once, jnp.eye(4), jnp.zeros((2,)), iters=30)
    fps = 1.0 / dt_track

    # ---- mapping GN iteration latency --------------------------------------
    dims = make_dims(num_kf=9, num_ow=24, M=64, img_size=img_size)
    sigmas = SigmaStatic()
    state, pairs, K_intr = make_demo_state(dims, num_kf=9, num_ow=8)

    def gn_once(state):
        return gn_step(state, *pairs, K_intr, dims, sigmas, 1e-6)

    dt_gn = time_fn(gn_once, state, warmup=2, iters=10)

    # ---- enlarged-window / high-res BA stress (BASELINE.json configs[3]) ----
    # GN-iteration latency at K=18/O=48 (double window) and at 384x512
    # (4x pixels); min-of-N to reject tunnel load spikes.
    stress = {}
    for tag, skw in (("gn_k18_o48_192x256_ms",
                      dict(num_kf=18, num_ow=48, fill_ow=16, hw=img_size)),
                     ("gn_k9_o24_384x512_ms",
                      dict(num_kf=9, num_ow=24, fill_ow=8, hw=(384, 512)))):
        d_s = make_dims(num_kf=skw["num_kf"], num_ow=skw["num_ow"], M=64,
                        img_size=skw["hw"])
        st_s, pr_s, K_s = make_demo_state(d_s, num_kf=skw["num_kf"],
                                          num_ow=skw["fill_ow"])

        def gn_s(state, _pr=pr_s, _K=K_s, _d=d_s):
            return gn_step(state, *_pr, _K, _d, sigmas, 1e-6)

        ts_s = [time_fn(gn_s, st_s, warmup=1, iters=3) for _ in range(3)]
        stress[tag] = round(1000.0 * min(ts_s), 2)
        del st_s

    # ---- end-to-end SLAM: full size on the HARD synthetic world -------------
    # (192x256, 9 KF / 24 OW, 64 anchors on ClutterScene: occlusions + depth
    # discontinuities; exact GT.  Steady-state FPS after a 20-frame warmup +
    # scale-aligned ATE — the reference's whole-system validation path.)
    # Seed-median over 3 seeds (single-seed ATE was seed-noise dominated
    # round-over-round); dispatch_depth=2 is the measured configuration for
    # remote-attached chips (decisions resolve 2 frames after dispatch,
    # hiding the tunnel round trip; ATE vs depth 1 pinned unchanged by
    # tests/test_e2e_clutter.py).
    from como_tpu.config import ComoConfig
    from como_tpu.data.synthetic import SyntheticDataset
    from como_tpu.runtime.seq import ComoSeq
    from como_tpu.utils.io import ate_rmse

    per_seed = []
    probe_frames = None  # seed-0 frames, captured for the burst probe below
    for seed in (0, 1, 2):
        cfg_e2e = ComoConfig()
        cfg_e2e.img_size = list(img_size)
        # frame batching, 3 pairs in flight (fixed depths — deterministic;
        # adaptive resolve was measured nondeterministic and deleted):
        # two frames + two GN steps per device program, decisions resolve
        # in pair units 6-7 frames after dispatch.  Measured min-of-3 vs
        # the r3 unbatched depth-2 config on this transport (profile_e2e,
        # 89 steady frames): 23.9 ms/frame vs 34.1 — and much tighter
        # run-over-run (2124-2292 ms vs 3031-6196) because one blocking
        # decision read serves two frames and three pairs of slack keep
        # it off the tunnel's critical path.  Seed-median ATE unchanged
        # (10.16 vs 9.91 cm, same 3 seeds).
        cfg_e2e.frame_batch = 2
        cfg_e2e.dispatch_depth = 6
        cfg_e2e.validate()
        ds = SyntheticDataset(n_frames=110, img_size=img_size, seed=seed,
                              step=0.02, scene="clutter")
        # pre-render: ds[i] is a ~12 ms/frame host-side ray-cast — input
        # acquisition, not SLAM compute (the reference streams pre-stored
        # dataset PNGs; como/data/odom_datasets.py); keep it off the clock
        frames = [ds[i] for i in range(len(ds))]
        if seed == 0:
            probe_frames, probe_intr = frames, ds.intrinsics
        eng = ComoSeq(cfg_e2e, ds.intrinsics, img_size)
        eng.setup()
        t0 = time.perf_counter()
        lat = []
        for i, (ts_i, rgb_i) in enumerate(frames):
            s = time.perf_counter()
            eng.step(float(ts_i), rgb_i)
            lat.append(time.perf_counter() - s)
            if i == 20:
                t0 = time.perf_counter()
                lat = []
        eng.finish()
        e2e_fps = (len(ds) - 21) / (time.perf_counter() - t0)
        lat_ms = np.array(lat) * 1e3
        ts_arr = np.asarray(eng.timestamps)
        est = np.stack([np.array(p) for p in eng.est_poses])
        idx = (ts_arr * 30.0).round().astype(int)
        gt = np.array(ds.poses)[idx]
        e2e_ate = float(ate_rmse(est, gt, with_scale=True))
        seed_path = float(np.sum(np.linalg.norm(
            np.diff(np.array(ds.poses)[:, :3, 3], axis=0), axis=-1)))
        per_seed.append(dict(seed=seed, fps=round(float(e2e_fps), 2),
                             ate_cm=round(100.0 * e2e_ate, 3),
                             median_ms=round(float(np.median(lat_ms)), 1),
                             p90_ms=round(float(np.percentile(lat_ms, 90)), 1),
                             frames_tracked=int(len(ts_arr)),
                             path_len_m=round(seed_path, 3)))
    med = lambda k: float(np.median([r[k] for r in per_seed]))  # noqa: E731
    path_len = med("path_len_m")

    # ---- fused frame-program service rate -----------------------------------
    # Back-to-back dispatches of the per-frame program (tracking + one GN
    # iteration fused), blocking once at the end: the rate the dispatch
    # queue can sustain with no per-frame host sync.  On a locally
    # attached chip this is the e2e throughput ceiling; against a remote
    # tunnel it separates transport service time from framework overhead
    # (measured: the e2e gap to 30 FPS is entirely transport — the
    # engine's host-side cost is ~4 ms/frame at resolve_stride 2).
    # A DEDICATED throwaway engine on seed-0 frames: _dispatch_fused
    # mutates mapping/tracker state through donated buffers, so probing
    # on a measured engine would corrupt it (ADVICE r3).  Unbatched
    # config: the probe measures the SINGLE-frame program's service rate.
    cfg_probe = ComoConfig()
    cfg_probe.img_size = list(img_size)
    cfg_probe.dispatch_depth = 2
    cfg_probe.validate()
    peng = ComoSeq(cfg_probe, probe_intr, img_size)
    peng.setup()
    for ts_i, rgb_i in probe_frames[:40]:
        peng.step(float(ts_i), rgb_i)
    peng.finish()
    rgb_last = probe_frames[-1][1]

    def fused_burst(n):
        t0b = time.perf_counter()
        for k in range(n):
            pend = peng._dispatch_fused(float(1000 + k), rgb_last)
        jax.block_until_ready(pend["stats"])
        return n / (time.perf_counter() - t0b)

    fused_burst(5)  # warm
    prog_fps = max(fused_burst(30) for _ in range(3))

    # headline: tracking FPS vs the 30 FPS real-time bar; report GN + e2e too
    result = {
        "metric": "tracking_fps",
        "value": round(float(fps), 2),
        "unit": "frames/s",
        "vs_baseline": round(float(fps / 30.0), 3),
        "extra": {
            "mapping_gn_iter_ms": round(1000.0 * dt_gn, 2),
            "gn_vs_50ms_budget": round(0.05 / dt_gn, 3),
            "stress": stress,
            "e2e_fps": round(med("fps"), 2),
            "e2e_median_ms": round(med("median_ms"), 1),
            "e2e_p90_ms": round(med("p90_ms"), 1),
            "e2e_ate_cm": round(med("ate_cm"), 3),
            "e2e_per_seed": per_seed,
            "frame_program_throughput_fps": round(float(prog_fps), 2),
            "e2e_dispatch_depth": 6,
            "e2e_frame_batch": 2,
            "e2e_world": "clutter 192x256, 9KF/24OW, 64 anchors, "
                         f"110 frames, {path_len:.2f} m path, seed-median of 3",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
