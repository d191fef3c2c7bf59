"""Observability: CSV metric logs, timers, and jax.profiler traces.

The reference's observability is print() + per-step pandas CSVs + wall-clock
timers (reference ddpm.py:1563-1565, test.py:392-399, SURVEY.md §5.1/5.5).
This module is the first-class equivalent: structured CSV logging, a
device-aware timer (block_until_ready fencing), and profiler trace capture
for XLA/TPU timeline inspection.
"""

from __future__ import annotations

import contextlib
import csv
import os
import time
from typing import Dict, List


class CsvLogger:
    """Append-style metric logger (one CSV per stream).

    Equivalent of the reference's pandas-DataFrame-rewritten-per-step CSVs
    (ddpm.py:1471-1472, 1563-1565) but append-only O(1) per row.
    """

    def __init__(self, path: str, fields: List[str]):
        self.path = path
        self.fields = fields
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fresh = not os.path.exists(path)
        self._fh = open(path, "a", newline="")
        self._writer = csv.DictWriter(self._fh, fieldnames=fields)
        if self._fresh:
            self._writer.writeheader()
            self._fh.flush()

    def log(self, **row):
        self._writer.writerow({k: row.get(k, "") for k in self.fields})
        self._fh.flush()

    def close(self):
        self._fh.close()


class Timer:
    """Wall-clock phase timer with device fencing."""

    def __init__(self):
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def time(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def mean(self, name: str) -> float:
        xs = self.records.get(name, [])
        return sum(xs) / len(xs) if xs else float("nan")

    def summary(self) -> Dict[str, float]:
        return {k: self.mean(k) for k in self.records}


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax_trace", enabled: bool = True):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def honor_platform_env() -> None:
    """Make JAX_PLATFORMS authoritative even when a platform plugin
    programmatically prepends itself to jax.config.jax_platforms (the axon
    TPU plugin does).  Call at entry-point start, after importing jax."""
    import os

    import jax

    want = os.environ.get("JAX_PLATFORMS", "")
    if want and jax.config.jax_platforms != want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


def enable_compilation_cache(path: str = "/tmp/jax_cache") -> None:
    """Persist compiled executables across processes (huge win when compiles
    go through a remote compile service)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
