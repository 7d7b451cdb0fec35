"""Per-stage device-time profiling (structured; opt-in).

The reference has no profiling subsystem at all (SURVEY.md section 5 lists
tracing as a rebuild obligation); production serving needs to know WHERE a
frame's milliseconds go. Two complementary modes, both off by default:

1. Stage timers (`DRSLAM_PROFILE_STAGES=1` or `profiler.enable()`): every
   major pipeline stage (front-end extract, fused track dispatch, deferred
   resolve, each LocalMapping phase, BA, loop closing) is timed host-side
   with a `jax.block_until_ready` on the stage's outputs, i.e. the number IS
   the device time of the stage (plus dispatch overhead). Synchronizing
   perturbs the pipelined schedule -- that is inherent to stage attribution
   and is why this is a mode, not the default.
2. XLA trace (`DRSLAM_PROFILE_DIR=/path`): a `jax.profiler` trace of the
   untouched pipelined schedule for TensorBoard, hooked in bench.py.

Usage:
    from dr_slam_tpu.utils.profiling import PROFILER
    with PROFILER.span("track.dispatch", sync=out):
        ...
    PROFILER.summary()  # {stage: {count, total_ms, mean_ms, p50_ms, p95_ms}}
"""

from __future__ import annotations

import collections
import contextlib
import json
import os
import time


class StageProfiler:
    def __init__(self):
        self._times = collections.defaultdict(list)  # name -> [ms]
        self.enabled = bool(os.environ.get("DRSLAM_PROFILE_STAGES"))

    def enable(self):
        self.enabled = True

    def disable(self):
        self.enabled = False

    def reset(self):
        self._times.clear()

    @contextlib.contextmanager
    def span(self, name: str, sync=None):
        """Time a stage. `sync` (any pytree of jax arrays) is blocked on at
        exit so the span closes when the DEVICE work is done, not when the
        dispatch returns."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax
                try:
                    jax.block_until_ready(sync)
                except Exception:
                    pass
            self._times[name].append((time.perf_counter() - t0) * 1e3)

    def record(self, name: str, ms: float):
        if self.enabled:
            self._times[name].append(ms)

    def summary(self) -> dict:
        out = {}
        for name, ts in sorted(self._times.items()):
            s = sorted(ts)
            n = len(s)
            out[name] = {
                "count": n,
                "total_ms": round(sum(s), 3),
                "mean_ms": round(sum(s) / n, 3),
                "p50_ms": round(s[n // 2], 3),
                "p95_ms": round(s[min(n - 1, int(0.95 * n))], 3),
            }
        return out

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=1)


PROFILER = StageProfiler()
