"""Profiling harness (SURVEY.md section 5.1).

- ``timed``: block_until_ready wall-clock timing of jitted callables
  (median-of-repeats, compile excluded by a warmup call).
- ``ScoringThroughput``: the north-star counter — candidate cuts scored per
  second per chip (BASELINE.json metric).
- ``trace``: context manager emitting a Perfetto/XProf dump via
  jax.profiler.trace — wired to the CLI's --trace flag and bench.py --trace.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str | None):
    """Kernel-level trace of the enclosed block (no-op when logdir is None).

    Writes a Perfetto/XProf dump under ``logdir`` (open with xprof or
    ui.perfetto.dev).  Usage: ``with trace(args.trace): run_rounds()``."""
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def timed(fn, *args, repeats: int = 5, warmup: int = 1, **kwargs):
    """Returns (median_seconds, last_result). fn must return jax arrays."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out


class ScoringThroughput:
    """Accumulates (candidates scored, seconds) -> candidates/sec/chip."""

    def __init__(self, n_chips: int = 1):
        self.n_chips = n_chips
        self.candidates = 0
        self.seconds = 0.0

    def add(self, candidates: int, seconds: float):
        self.candidates += candidates
        self.seconds += seconds

    @property
    def per_sec_per_chip(self) -> float:
        if self.seconds <= 0:
            return 0.0
        return self.candidates / self.seconds / self.n_chips
