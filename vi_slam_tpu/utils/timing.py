"""Per-stage timing statistics.

Replaces the reference's `#ifdef REGISTER_TIMES` instrumentation
(`/root/reference/include/vi_slam/core/tracking.h:172-189`,
`Tracking::PrintTimeStats` tracking.cpp:252) and vilib's Timer/Statistics
(`thirdparty/vilib/.../timer.h`, `statistics.h`) with a simple host-side
stage stopwatch that synchronizes on device results.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, List

import jax
import numpy as np


class StageTimer:
    """Accumulates wall-clock samples per named stage."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextmanager
    def stage(self, name: str, sync=None):
        """Time a stage; pass `sync=` a jax array (or pytree) to
        block_until_ready before stopping the clock."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.samples[name].append((time.perf_counter() - t0) * 1e3)

    def reset(self):
        """Drop accumulated samples (new measurement window)."""
        self.samples = defaultdict(list)

    def add(self, name: str, millis: float):
        if self.enabled:
            self.samples[name].append(millis)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "mean_ms": float(a.mean()),
                "median_ms": float(np.median(a)),
                "p90_ms": float(np.percentile(a, 90)),
                "count": int(a.size),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<28}{'mean':>9}{'median':>9}{'p90':>9}{'n':>7}"]
        for name, s in self.summary().items():
            lines.append(
                f"{name:<28}{s['mean_ms']:>8.2f}m{s['median_ms']:>8.2f}m"
                f"{s['p90_ms']:>8.2f}m{s['count']:>7d}"
            )
        return "\n".join(lines)
