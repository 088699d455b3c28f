"""Profiling/tracing helpers.

The reference has no profiling story (SURVEY.md §5); the TPU-native
observability surface here is `jax.profiler` traces plus a simple
blocking-wall-clock timer that understands async dispatch (time N enqueues,
block once — required on remote-tunnel devices where every blocking call
pays RTT).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["trace", "annotate", "time_fn", "enable_compile_cache"]


def enable_compile_cache(path: str = "/tmp/tpubq_xla_cache"):
    """Persist XLA compiles across processes (remote-TPU compiles are slow).

    The single shared implementation for bench.py and every benchmarks/
    script. Known hazard (memory + verify notes): a run killed mid-write
    leaves a truncated cache entry and the NEXT process segfaults in
    jax's compilation-cache read — ``rm -rf <path>`` is the cure; changing
    the path or adding corruption handling belongs HERE, not in per-script
    copies.
    """
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpubq_trace"):
    """Capture a jax.profiler trace around a block (view with XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation, usable as decorator or context manager."""
    return jax.profiler.TraceAnnotation(name)


def time_fn(fn: Callable, *args, iters: int = 50, warmup: int = 2, repeats: int = 3):
    """Median seconds per call of an async-dispatching jitted function.

    Enqueues ``iters`` calls and blocks once per repeat (correct on devices
    where blocking has RTT cost); returns (seconds_per_call, last_output).
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2], out
