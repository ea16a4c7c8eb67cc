"""Dependency-free CPU probe loop.

Lives in its own module so multiprocessing spawn workers unpickling
``probe_loop`` import ONLY this file — importing it from bench.py would
drag the whole pyspark import into every probe worker and record ~600 ms
of import time as fake contention (observed before the split).
"""

from __future__ import annotations

import time


def probe_loop(_=None) -> float:
    """Wall seconds for a fixed 5M-iteration Python loop — the same
    calibration loop as bench._cpu_probe_ms, importable cheaply."""
    t0 = time.perf_counter()
    s = 0
    for i in range(5_000_000):
        s += i
    assert s >= 0
    return time.perf_counter() - t0
