"""Timing/tracing — TicToc parity + structured per-stage metrics.

The reference scopes everything with TicToc stopwatches and streams named
samples to `<name>.bin` for offline MATLAB analysis
(/root/reference/vins_estimator/src/utility/tic_toc.h:10-47, used for
fsel_cost at estimator_node.cpp:338-341 and afs_cost at
feature_tracker_ros.cpp:63-66), plus aggregate printStatistics
(visualization.cpp:68-108).

Here: a `TicToc` context manager with the same named-binary-log behavior
(float64 seconds appended to <name>.bin — MATLAB `timing.m` compatible),
an aggregating registry, and a `jax_profile` helper wrapping
jax.profiler.trace for on-device timelines (the xprof replacement for
wall-clock scoping of device work).
"""

from __future__ import annotations

import contextlib
import os
import struct
import time
from collections import defaultdict
from typing import Optional

_STATS = defaultdict(lambda: [0, 0.0, 0.0])  # name -> [count, total, max]


class TicToc:
    """Stopwatch; optionally streams each sample to `<dir>/<name>.bin`.

    with TicToc("fsel_cost", log_dir="/tmp/timing"):
        ... work ...
    """

    def __init__(self, name: Optional[str] = None,
                 log_dir: Optional[str] = None):
        self.name = name
        self.log_dir = log_dir
        self.t0 = time.perf_counter()

    def tic(self):
        self.t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self.t0
        if self.name:
            s = _STATS[self.name]
            s[0] += 1
            s[1] += dt
            s[2] = max(s[2], dt)
            if self.log_dir:
                os.makedirs(self.log_dir, exist_ok=True)
                with open(os.path.join(self.log_dir, f"{self.name}.bin"),
                          "ab") as f:
                    f.write(struct.pack("<d", dt))
        return dt

    def __enter__(self):
        self.tic()
        return self

    def __exit__(self, *exc):
        self.toc()
        return False


def stats() -> dict:
    """Aggregate timing table (printStatistics analog)."""
    return {k: {"count": v[0], "mean": v[1] / max(v[0], 1), "max": v[2]}
            for k, v in _STATS.items()}


def reset_stats():
    _STATS.clear()


def read_bin_log(path: str):
    """Read a `<name>.bin` sample stream (timing.m post-processing analog)."""
    import numpy as np
    raw = open(path, "rb").read()
    return np.frombuffer(raw, dtype="<f8")


@contextlib.contextmanager
def jax_profile(log_dir: str):
    """Capture a device trace viewable in xprof/tensorboard — the TPU
    replacement for host stopwatches around device work (SURVEY.md §5)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
