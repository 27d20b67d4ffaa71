"""Isolate the transport question frame batching hinges on: does ONE
fused two-frame program (runtime/seq.py::_fused_pair_program) serve
faster than TWO single-frame programs (_fused_frame_program) on this
attachment?  Burst-dispatches N programs back-to-back, blocks once, and
reports frames/s — min-of-R to reject tunnel load spikes (CLAUDE.md).

    python scripts/probe_pair_throughput.py --n 30 --reps 5
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=30, help="programs per burst")
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax  # host-keyed persistent compile cache is set by the package

    from como_tpu.config import ComoConfig
    from como_tpu.data.synthetic import SyntheticDataset
    from como_tpu.runtime.seq import ComoSeq

    IMG = (192, 256)
    cfg = ComoConfig()
    cfg.img_size = list(IMG)
    cfg.dispatch_depth = 2
    cfg.validate()
    ds = SyntheticDataset(n_frames=40, img_size=IMG, seed=0, step=0.012,
                          scene="clutter")
    eng = ComoSeq(cfg, ds.intrinsics, IMG)
    eng.setup()
    # run enough frames to initialize mapping + build a real window
    for i in range(40):
        ts, rgb = ds[i]
        eng.step(float(ts), rgb)
    eng.finish()
    rgb = ds[39][1]

    def burst_single(n):
        t0 = time.perf_counter()
        for k in range(n):
            pend = eng._dispatch_fused(float(1000 + k), rgb)
        jax.block_until_ready(pend["stats"])
        return n / (time.perf_counter() - t0)

    def burst_pair(n):
        t0 = time.perf_counter()
        for k in range(n):
            _, pb = eng._dispatch_pair(float(2000 + 2 * k), rgb,
                                       float(2001 + 2 * k), rgb)
        jax.block_until_ready(pb["stats"])
        return 2 * n / (time.perf_counter() - t0)

    burst_single(4)  # warm/compile
    burst_pair(4)
    singles = [burst_single(args.n) for _ in range(args.reps)]
    pairs = [burst_pair(args.n) for _ in range(args.reps)]
    fmt = lambda xs: " ".join(f"{x:6.1f}" for x in xs)  # noqa: E731
    print(f"single-frame programs: {fmt(singles)}  best {max(singles):.1f} "
          "frames/s")
    print(f"two-frame programs:    {fmt(pairs)}  best {max(pairs):.1f} "
          "frames/s")
    print(f"pair/single best ratio: {max(pairs) / max(singles):.2f}x")


if __name__ == "__main__":
    main()
