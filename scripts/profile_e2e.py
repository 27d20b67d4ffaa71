"""Per-phase wall-time breakdown of the sequential engine on the real
TPU: wraps the engine's internal phases with timers and reports
count / total / median / p90 per phase over a full-size run.  Separates
device-program cost from host bookkeeping and shows where per-frame
latency spikes (KF/OW insertion, reference refresh) come from.

    python scripts/profile_e2e.py --frames 120
"""

import argparse
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--img", type=int, nargs=2, default=[192, 256])
    p.add_argument("--scene", default="clutter")
    p.add_argument("--warmup", type=int, default=30)
    p.add_argument("--lag", type=int, default=None,
                   help="override engine decision_lag (dispatch depth)")
    p.add_argument("--batch", type=int, default=None,
                   help="frames per fused device program (cfg.frame_batch)")
    p.add_argument("--prerender", action="store_true",
                   help="render all frames to host numpy before the loop")
    args = p.parse_args()

    import jax  # host-keyed persistent compile cache is set by the package
    import numpy as np

    from como_tpu.config import ComoConfig
    from como_tpu.data.synthetic import SyntheticDataset
    from como_tpu.runtime.seq import ComoSeq

    IMG = tuple(args.img)
    cfg = ComoConfig()
    cfg.img_size = list(IMG)
    if args.batch is not None:
        cfg.frame_batch = args.batch
        if args.batch == 2:
            cfg.dispatch_depth = max(args.lag or 2, 2)
    cfg.validate()
    ds = SyntheticDataset(n_frames=args.frames, img_size=IMG, seed=0,
                          step=0.012, scene=args.scene)
    eng = ComoSeq(cfg, ds.intrinsics, IMG)
    eng.setup()
    if args.lag is not None:
        eng.decision_lag = args.lag
    frames = None
    if args.prerender:
        frames = [(float(t), np.asarray(r))
                  for t, r in (ds[i] for i in range(len(ds)))]

    acc = defaultdict(list)
    recording = [False]

    def wrap(obj, name, label=None):
        f = getattr(obj, name)
        key = label or name

        def g(*a, **k):
            t0 = time.perf_counter()
            r = f(*a, **k)
            if recording[0]:
                acc[key].append(time.perf_counter() - t0)
            return r
        setattr(obj, name, g)

    wrap(eng, "_dispatch_fused")
    wrap(eng, "_dispatch_pair")
    wrap(eng, "_resolve_one")
    wrap(eng, "_refresh_reference")
    wrap(eng.tracking, "dispatch_frame", "tracking.dispatch_frame")
    wrap(eng.tracking, "decide", "tracking.decide")
    wrap(eng.tracking, "update_kf_reference", "tracking.update_kf_ref")
    wrap(eng.mapping, "handle_tracking_data", "mapping.insert")
    wrap(eng.mapping, "add_keyframe", "mapping.add_keyframe")
    wrap(eng.mapping, "add_one_way_frame", "mapping.add_one_way")
    wrap(eng.mapping, "get_kf_ref_data", "mapping.get_kf_ref_data")

    lat = []
    for i in range(len(ds)):
        ts, rgb = frames[i] if frames is not None else ds[i]
        s = time.perf_counter()
        eng.step(float(ts), rgb)
        dt = time.perf_counter() - s
        if i == args.warmup:
            recording[0] = True
        elif recording[0]:
            lat.append(dt)
    eng.finish()

    lat_ms = np.array(lat) * 1e3
    n = len(lat_ms)
    print(f"device: {jax.devices()[0]}  steady frames: {n}")
    print(f"frame wall: total {lat_ms.sum():8.0f} ms  median "
          f"{np.median(lat_ms):6.1f}  p90 {np.percentile(lat_ms, 90):6.1f}  "
          f"max {lat_ms.max():6.1f}")
    print(f"{'phase':<26}{'n':>5}{'total_ms':>10}{'median':>8}{'p90':>8}"
          f"{'max':>8}")
    for k in sorted(acc, key=lambda k: -sum(acc[k])):
        v = np.array(acc[k]) * 1e3
        print(f"{k:<26}{len(v):>5}{v.sum():>10.0f}{np.median(v):>8.1f}"
              f"{np.percentile(v, 90):>8.1f}{v.max():>8.1f}")


if __name__ == "__main__":
    main()
