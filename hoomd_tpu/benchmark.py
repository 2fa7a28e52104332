"""Benchmark harness (reference hoomd/benchmark.py:13-36)."""

from __future__ import annotations

import time

from . import context


def series(warmup=100000, repeat=20, steps=10000, limit_hours=None):
    """Run ``repeat`` timed segments of ``steps`` steps after ``warmup``;
    returns the list of TPS values (reference benchmark.series)."""
    system = context.current.system
    if warmup:
        system.run(warmup, quiet=True)
    tps = []
    deadline = (time.time() + limit_hours * 3600.0) if limit_hours else None
    for _ in range(repeat):
        t0 = time.perf_counter()
        system.run(steps, quiet=True)
        tps.append(steps / (time.perf_counter() - t0))
        if deadline and time.time() > deadline:
            break
    return tps
