"""Profiling and step-timing utilities.

The reference only accumulates wall-clock deltas
(``detectors/pointpillars.py:39-41,400-406``, ``train.py:208-226``) —
and does so WITHOUT accounting for async dispatch. Here:

  * :class:`StepTimer` blocks on a representative output before reading
    the clock, so measured step times are real device times;
  * :func:`trace` wraps ``jax.profiler`` for on-demand XLA traces
    (viewable in TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Running average step timer that respects async dispatch."""

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *block_on):
        """Stop timing; blocks on the given arrays first."""
        for x in block_on:
            for leaf in jax.tree_util.tree_leaves(x):
                if hasattr(leaf, "block_until_ready"):
                    leaf.block_until_ready()
        dt = time.perf_counter() - self._t0
        self.total += dt
        self.count += 1
        return dt

    @property
    def avg(self) -> float:
        return self.total / max(self.count, 1)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace around a code block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region for profiler timelines."""
    with jax.profiler.TraceAnnotation(name):
        yield
