"""Per-stage GN-iteration profile at bench + stress dims (real TPU).

Times each pipeline stage of the GN step as its own jitted program
(min-of-N against tunnel spikes): scaffold, dense points, photometric
linearization, full assembly (no solve), full step (with solve).
Differences localize the stress-cell budget (VERDICT r4 #5).

    python scripts/profile_gn.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_fn(fn, *args, warmup=1, iters=5, reps=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax
    from functools import partial

    from como_tpu.odom.backend import gn_step as g
    from como_tpu.odom.window import make_dims
    from como_tpu.utils.demo import make_demo_state

    sigmas = g.SigmaStatic()

    configs = [
        ("k9_o24_192x256", dict(num_kf=9, num_ow=24, fill=8, hw=(192, 256))),
        ("k18_o48_192x256", dict(num_kf=18, num_ow=48, fill=16, hw=(192, 256))),
        ("k9_o24_384x512", dict(num_kf=9, num_ow=24, fill=8, hw=(384, 512))),
    ]

    for tag, c in configs:
        dims = make_dims(num_kf=c["num_kf"], num_ow=c["num_ow"], M=64,
                         img_size=c["hw"])
        state, pairs, K_intr = make_demo_state(dims, num_kf=c["num_kf"],
                                               num_ow=c["fill"])

        @partial(jax.jit, static_argnames=())
        def scaffold_only(st):
            return g._scaffold(st, K_intr, dims, sigmas.far_depth_ratio)

        @partial(jax.jit, static_argnames=())
        def dense_only(st):
            sc = g._scaffold(st, K_intr, dims, sigmas.far_depth_ratio)
            st = st._replace(P_lm=sc["P_lm_new"])
            return g._dense_points(st, sc, K_intr, dims)

        @partial(jax.jit, static_argnames=())
        def photo_only(st):
            sc = g._scaffold(st, K_intr, dims, sigmas.far_depth_ratio)
            st = st._replace(P_lm=sc["P_lm_new"])
            dn = g._dense_points(st, sc, K_intr, dims)
            return g._photo(st, sc, dn, *pairs, K_intr, dims,
                            occl_thresh=sigmas.occlusion_thresh,
                            estimate_affine=sigmas.estimate_affine)

        def assemble_only(st):
            return g.gn_system(st, *pairs, K_intr, dims, sigmas)

        def full_step(st):
            return g.gn_step(st, *pairs, K_intr, dims, sigmas, 1e-6)

        ms = {}
        for name, fn in (("scaffold", scaffold_only),
                         ("+dense", dense_only),
                         ("+photo", photo_only),
                         ("+assemble", assemble_only),
                         ("full(step+solve)", full_step)):
            ms[name] = 1e3 * time_fn(fn, state, iters=args.iters)
        print(f"\n== {tag}  (D={dims.D}, pairs={pairs[0].shape[0]}, "
              f"ND={dims.ND})")
        prev = 0.0
        for name, v in ms.items():
            print(f"  {name:<18} {v:8.2f} ms   (+{v - prev:6.2f})")
            prev = v
        del state


if __name__ == "__main__":
    main()
