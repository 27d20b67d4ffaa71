"""e2e-in-the-loop checkpoint selection for the DepthCov prior.

Round-3 lesson (NOTES_ROUND3 "Prior-selection metric"): both proxy
scores (extrapolation MSE, mse+nll) fail to predict end-to-end ATE —
one is anti-correlated.  The only selector that tracks what the product
cares about is the product itself: run short SLAM sequences with the
candidate prior and score the trajectory.

Score = the WORST-CASE ATE ratio vs the analytic prior across held-out
worlds (lower is better; <= 1.0 means the candidate wins-or-ties every
world — the shipping bar, reference ships ONE checkpoint for everything,
como/odom/Mapping.py:397-407).  Ratios, not raw ATEs, so the easy world
(plane, ~1-2 cm) and the hard world (clutter, ~5-10 cm) weigh equally.

    python scripts/select_checkpoint.py models/*.msgpack
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# held-out worlds: ALL eval seeds sit above the training pool (training
# instantiates scene instances sid = seed % 12, i.e. scene seeds 0-11 —
# train_depthcov.py:synthetic_batch; the r4 selector's seeds 10/11 were
# training instances, ADVICE r4).  TWO seeds per world, scored as a
# ratio of per-world MEANS: single-seed calibration showed one clutter
# instance alone can be analytic-friendly (1.12 cm full-size — a 5x
# harsher bar than the eval-matrix seeds), so one seed per world makes
# the worst-ratio score hostage to one world instance's quirks.
EVAL_WORLDS = (("clutter", (13, 16)), ("plane", (14, 17)))

# Score at the PRODUCT resolution.  Calibration on the r2 checkpoint
# (known full-size behavior: wins clutter, loses plane 2-4x vs analytic,
# results/eval_matrix.json): at 96x128/60f it scores worst 0.99x — it
# WINS plane small (1.68 vs 8.66 cm) — so small-size evals cannot see
# the full-size plane failure at all (a feature-scale shift the
# fully-convolutional UNet does not absorb; same effect that motivated
# --multires training).  Only full-size scoring is predictive.
DEFAULT_IMG = (192, 256)


def run_slam(prior: str, model_path: str, scene: str, seed: int,
             frames: int = 60, img=DEFAULT_IMG) -> float:
    """One short deterministic SLAM run; returns scale-aligned ATE (m)."""
    import numpy as np

    from como_tpu.config import ComoConfig
    from como_tpu.data.synthetic import SyntheticDataset
    from como_tpu.runtime.seq import ComoSeq
    from como_tpu.utils.io import ate_rmse

    cfg = ComoConfig()
    cfg.img_size = list(img)
    cfg.mapping.prior = prior
    cfg.mapping.model_path = model_path or ""
    cfg.validate()
    ds = SyntheticDataset(n_frames=frames, img_size=img, seed=seed,
                          step=0.012, scene=scene)
    eng = ComoSeq(cfg, ds.intrinsics, img)
    eng.setup()
    ts, est = eng.run(ds)
    idx = (np.asarray(ts) * 30.0).round().astype(int)
    return float(ate_rmse(est, np.array(ds.poses)[idx], with_scale=True))


class E2EScorer:
    """Scores candidate UNet params by short SLAM runs vs the analytic
    baseline.  Baselines run once; each candidate costs ~len(EVAL_WORLDS)
    sequences (first candidate additionally pays the compile, cached)."""

    def __init__(self, frames: int = 60, img=DEFAULT_IMG, verbose=True):
        self.frames, self.img, self.verbose = frames, tuple(img), verbose
        self.baselines = None

    def _ensure_baselines(self):
        if self.baselines is None:
            self.baselines = {
                s: sum(run_slam("analytic", "", s, sd, self.frames, self.img)
                       for sd in seeds) / len(seeds)
                for s, seeds in EVAL_WORLDS}
            if self.verbose:
                base = " ".join(f"{s}={a * 100:.2f}cm"
                                for s, a in self.baselines.items())
                print(f"[e2e-select] analytic baselines (per-world mean): "
                      f"{base}", flush=True)

    def score_path(self, model_path: str):
        """-> (worst_ratio, {world: (mean_ate_m, ratio)})"""
        self._ensure_baselines()
        detail = {}
        for s, seeds in EVAL_WORLDS:
            ate = sum(run_slam("unet", model_path, s, sd, self.frames,
                               self.img) for sd in seeds) / len(seeds)
            detail[s] = (ate, ate / self.baselines[s])
        worst = max(r for _, r in detail.values())
        if self.verbose:
            tag = " ".join(f"{k}={a * 100:.2f}cm({r:.2f}x)"
                           for k, (a, r) in detail.items())
            print(f"[e2e-select] {os.path.basename(model_path)}: "
                  f"worst {worst:.2f}x  {tag}", flush=True)
        return worst, detail

    def score_params(self, params):
        """Score in-memory params (training loop): round-trips through a
        temp msgpack so the scored artifact is byte-identical to what
        would ship."""
        from como_tpu.net.depthcov import save_params
        with tempfile.NamedTemporaryFile(suffix=".msgpack",
                                         delete=False) as f:
            tmp = f.name
        try:
            save_params(params, tmp)
            return self.score_path(tmp)
        finally:
            os.unlink(tmp)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoints", nargs="+", help="msgpack files to score")
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--img", type=int, nargs=2, default=list(DEFAULT_IMG))
    args = p.parse_args()

    scorer = E2EScorer(frames=args.frames, img=tuple(args.img))
    rows = [(ck,) + scorer.score_path(ck) for ck in args.checkpoints]
    rows.sort(key=lambda r: r[1])
    print("\nranked (best first):")
    for ck, worst, detail in rows:
        print(f"  {worst:.3f}x  {ck}")


if __name__ == "__main__":
    main()
