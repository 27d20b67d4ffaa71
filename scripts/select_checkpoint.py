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

# held-out worlds: seeds far outside the training pool (train uses
# seed%12 scene instances; validation MSE used 101-103)
EVAL_WORLDS = (("clutter", 10), ("plane", 11))


def run_slam(prior: str, model_path: str, scene: str, seed: int,
             frames: int = 60, img=(96, 128)) -> float:
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

    def __init__(self, frames: int = 60, img=(96, 128), verbose=True):
        self.frames, self.img, self.verbose = frames, tuple(img), verbose
        self.baselines = None

    def _ensure_baselines(self):
        if self.baselines is None:
            self.baselines = {
                (s, sd): run_slam("analytic", "", s, sd, self.frames, self.img)
                for s, sd in EVAL_WORLDS}
            if self.verbose:
                base = " ".join(f"{s}{sd}={a * 100:.2f}cm"
                                for (s, sd), a in self.baselines.items())
                print(f"[e2e-select] analytic baselines: {base}", flush=True)

    def score_path(self, model_path: str):
        """-> (worst_ratio, {world: (ate_m, ratio)})"""
        self._ensure_baselines()
        detail = {}
        for (s, sd), base in self.baselines.items():
            ate = run_slam("unet", model_path, s, sd, self.frames, self.img)
            detail[f"{s}{sd}"] = (ate, ate / base)
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
    p.add_argument("--img", type=int, nargs=2, default=[96, 128])
    args = p.parse_args()

    scorer = E2EScorer(frames=args.frames, img=tuple(args.img))
    rows = [(ck,) + scorer.score_path(ck) for ck in args.checkpoints]
    rows.sort(key=lambda r: r[1])
    print("\nranked (best first):")
    for ck, worst, detail in rows:
        print(f"  {worst:.3f}x  {ck}")


if __name__ == "__main__":
    main()
