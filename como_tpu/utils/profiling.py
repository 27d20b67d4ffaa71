"""Per-stage timing + jax profiler hooks.

The reference has no tracing/profiling at all (SURVEY.md section 5.1:
only a GUI FPS counter).  `StageTimer` records wall time per named stage
(track / linearize / solve / net / io) with exponential moving averages;
`trace` wraps a block in a jax profiler trace for TPU timelines.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class StageTimer:
    def __init__(self, ema: float = 0.1):
        self.ema = ema
        self.avg: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)
        self.last: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.last[name] = dt
            self.count[name] += 1
            a = self.avg[name]
            self.avg[name] = dt if self.count[name] == 1 else \
                (1 - self.ema) * a + self.ema * dt

    def report(self) -> str:
        return "  ".join(f"{k}={1000 * v:.1f}ms" for k, v in
                         sorted(self.avg.items()))


@contextlib.contextmanager
def trace(log_dir: str):
    """jax profiler trace around a block (view with tensorboard/xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
