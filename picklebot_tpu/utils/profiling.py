"""Profiling utilities (reference capability map: cProfile train.py:358-365,
torch.profiler profilemobilevit.py, pytorch_memlab profiling_mobilevit.py).

TPU equivalents:
  * ``trace(logdir)`` — jax.profiler xplane trace, viewable in
    TensorBoard/Perfetto (device timeline, HLO ops, memory).
  * ``timeit_fn`` — block_until_ready-bracketed steady-state timing.
  * ``memory_stats`` — live/peak HBM from the device allocator.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit_fn(fn: Callable, *args, warmup: int = 3, iters: int = 10,
              **kwargs) -> dict:
    """Compile + warm up, then time ``iters`` calls. Returns seconds stats."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "mean_s": sum(times) / len(times),
        "median_s": times[len(times) // 2],
        "min_s": times[0],
        "max_s": times[-1],
    }


def memory_stats(device=None) -> Optional[dict]:
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return None
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
