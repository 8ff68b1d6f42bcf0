"""Timing / profiling helpers.

TPU-aware equivalents of the reference's wall-clock helpers
(ref `/root/reference/src/network/core/utils/benchmark.py:4-25` and the
cProfile decorator in `/root/reference/src/utils/utils.py:17-32`).

On TPU, dispatch is asynchronous, so a plain ``time.time()`` around a jitted
call measures dispatch latency, not compute.  :func:`device_timer` blocks on
the result (``block_until_ready``), and :func:`trace` wraps a region in a
``jax.profiler`` trace for real XLA-level profiling.
"""
from __future__ import annotations

import contextlib
import cProfile
import functools
import io
import pstats
import time
from typing import Any, Callable

import jax


def timer(func: Callable) -> Callable:
    """Decorator printing the wall-clock time of each call."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        start = time.perf_counter()
        result = func(*args, **kwargs)
        print(f"{func.__name__} took {time.perf_counter() - start:.4f}s")
        return result

    return wrapper


def device_timer(func: Callable) -> Callable:
    """Like :func:`timer` but blocks until device results are materialized."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        start = time.perf_counter()
        result = func(*args, **kwargs)
        result = jax.block_until_ready(result)
        print(f"{func.__name__} took {time.perf_counter() - start:.4f}s (device)")
        return result

    return wrapper


def profile(func: Callable) -> Callable:
    """cProfile decorator printing the top 10% cumulative entries."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        pr = cProfile.Profile()
        pr.enable()
        result = func(*args, **kwargs)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(0.1)
        print(s.getvalue())
        return result

    return wrapper


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Wrap a region in a ``jax.profiler`` trace viewable in TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock per named pipeline stage (host-side)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on: Any = None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - start
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: total {total:.4f}s over {n} calls ({total / n:.5f}s/call)")
        return "\n".join(lines)
