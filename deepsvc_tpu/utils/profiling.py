"""Profiling / tracing helpers.

The reference's only observability is cuda-synced wall clocks
(SURVEY.md §5).  Here:
- :func:`force_sync` — correct completion barrier even on backends whose
  ``block_until_ready`` is a no-op (pulls one scalar per leaf tree).
- :class:`StageTimer` — wall-clock stage attribution with forced syncs.
- :func:`trace` — context manager around jax.profiler for real traces
  (viewable in TensorBoard / Perfetto) where the backend supports it.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import numpy as np


def force_sync(tree):
    """Force device completion of every array in the pytree."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[0:1]))
    return tree


class StageTimer:
    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result_ref: list | None = None):
        t0 = time.perf_counter()
        yield
        if self.sync and result_ref:
            force_sync(result_ref[0])
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> dict:
        return {
            k: {"total_s": self.totals[k], "mean_ms": 1e3 * self.totals[k] / self.counts[k]}
            for k in self.totals
        }


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
