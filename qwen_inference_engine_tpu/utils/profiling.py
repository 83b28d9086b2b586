"""Profiling hooks: jax.profiler traces + step timing.

TPU-native replacement for the reference's cudaEvent timer pairs around
every launch (reference: layers/src/qwen_main.cu:19-40 startCudaTimer /
stopCudaTimer gated by PRINT_TIME): instead of per-kernel host timers, a
Perfetto/TensorBoard trace of the jitted step (``--profile DIR`` on the
CLI) plus a block_until_ready wall-clock harness for step latencies.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(trace_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA/TPU profile into ``trace_dir`` (view with
    TensorBoard or Perfetto). No-op when trace_dir is falsy."""
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _hard_sync(out) -> None:
    """True-completion sync: fetch the smallest output leaf's value.
    (jax.block_until_ready can return early through device tunnels such as
    axon; a host value fetch cannot.)"""
    import numpy as np

    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    if not leaves:
        jax.block_until_ready(out)
        return
    smallest = min(leaves, key=lambda x: x.size)
    np.asarray(smallest)


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2, **kw) -> dict:
    """Wall-clock a jitted function: median/min seconds per call.

    Synchronizes via a host value fetch (async dispatch means per-call
    host timers without a sync measure nothing — the reference instead
    serialized everything with cudaDeviceSynchronize)."""
    for _ in range(warmup):
        out = fn(*args, **kw)
    _hard_sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _hard_sync(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "median_s": times[len(times) // 2],
        "min_s": times[0],
        "mean_s": sum(times) / len(times),
        "iters": iters,
    }
