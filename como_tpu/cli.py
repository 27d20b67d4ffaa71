"""Headless CLI entry point.

Spec: reference como/como_dataset.py / como_demo.py (argparse + YAML +
GUI app loop), inverted: the core loop is headless; pass --viz to attach
the optional viewer observer.

    python -m como_tpu.cli --dataset_type tum --dataset_dir .../fr2_desk/
    python -m como_tpu.cli --dataset_type synthetic --runtime pipeline
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser(description="como_tpu odometry")
    p.add_argument("--dataset_type", type=str, required=True,
                   help="tum | replica | scannet | realsense | synthetic")
    p.add_argument("--dataset_dir", type=str, default=None)
    p.add_argument("--config", type=str, default=None,
                   help="YAML config overriding defaults (configs/como.yml)")
    p.add_argument("--runtime", type=str, default="seq",
                   choices=["seq", "pipeline"])
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--save_traj", type=str, default="results")
    p.add_argument("--realtime", action="store_true",
                   help="pace frames to dataset timestamps")
    p.add_argument("--viz", action="store_true",
                   help="attach the Open3D viewer if available")
    p.add_argument("--profile", type=str, default=None,
                   help="directory for a jax profiler trace")
    p.add_argument("--resume", type=str, default=None,
                   help="mapping-state checkpoint to resume from")
    p.add_argument("--save_state", type=str, default=None,
                   help="write a mapping-state checkpoint at the end")
    p.add_argument("--log", type=str, default=None,
                   help="jsonl event-log path")
    args = p.parse_args(argv)

    # honor JAX_PLATFORMS from the environment: this image's sitecustomize
    # registers the TPU plugin at interpreter startup, so the env var alone
    # does not stick (CLAUDE.md "CPU runs"); required e.g. for
    # --config configs/mesh.yml on a forced-host-device CPU mesh.  Keep
    # the host cpu backend available alongside (como_tpu/__init__.py):
    # input acquisition is pinned to it (data/synthetic.py).
    import os
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        plat = os.environ["JAX_PLATFORMS"]
        if "cpu" not in plat.split(","):
            plat += ",cpu"
        jax.config.update("jax_platforms", plat)

    from como_tpu.config import load_config
    from como_tpu.data.datasets import get_dataset

    cfg = load_config(args.config)
    dataset = get_dataset(args.dataset_type, cfg.img_size, args.dataset_dir)

    if args.runtime == "seq":
        from como_tpu.runtime.seq import ComoSeq as Engine
    else:
        from como_tpu.runtime.pipeline import ComoPipeline as Engine

    eng = Engine(cfg, dataset.intrinsics, cfg.img_size)
    eng.setup()
    if args.log and hasattr(eng, "log"):
        from como_tpu.utils.log import EventLog
        eng.log = EventLog(args.log)
    if args.resume:
        from como_tpu.utils.checkpoint import load_mapping_state
        load_mapping_state(eng.mapping, args.resume)

    if args.viz:
        try:
            from como_tpu.viz.viewer import attach_viewer
            attach_viewer(eng)
        except Exception as e:  # viewer optional: Open3D may be absent
            print(f"[viz] viewer unavailable ({e}); running headless")

    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile)

    n = len(dataset) if args.max_frames is None else min(len(dataset),
                                                         args.max_frames)
    from como_tpu.runtime.queues import monotonic_now, sleep_until
    t_start = time.perf_counter()
    t_pace0 = monotonic_now()
    t0_ts = None
    for i in range(n):
        ts, rgb = dataset[i]
        ts = float(ts)
        if args.realtime and not dataset.is_live:
            # absolute-deadline pacing (native clock_nanosleep when the
            # C++ runtime lib is built): no per-frame drift accumulation,
            # unlike relative time.sleep (reference ComoMp.py:97-110)
            t0_ts = ts if t0_ts is None else t0_ts
            sleep_until(t_pace0 + (ts - t0_ts))
        eng.step(ts, rgb)
    wall = time.perf_counter() - t_start

    if args.profile:
        import jax
        jax.profiler.stop_trace()

    if hasattr(eng, "finish"):
        eng.finish()
    if hasattr(eng, "shutdown"):
        eng.shutdown()

    if args.save_state:
        from como_tpu.utils.checkpoint import save_mapping_state
        save_mapping_state(eng.mapping, args.save_state)

    os.makedirs(args.save_traj, exist_ok=True)
    name = getattr(dataset, "save_traj_name", args.dataset_type)
    out = os.path.join(args.save_traj, name + ".txt")
    eng.save_trajectory(out)
    print(f"{n} frames in {wall:.1f}s ({n / wall:.1f} FPS); trajectory -> {out}")


if __name__ == "__main__":
    main()
