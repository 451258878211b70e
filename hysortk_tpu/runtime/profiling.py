"""Device profiling: jax.profiler traces + a simple stage report.

The reference's observability is compile-time-gated wall-clock timers
(SURVEY.md §5; reference include/timer.hpp). The TPU-native replacement:

  * `trace(logdir)` — capture a full XLA/TPU trace viewable in TensorBoard
    or Perfetto (covers what the reference's LOG>=3 "(Inc)" spans did,
    per-op instead of per-stage).
  * `stage_report(...)` — wall-clock stage timing with device sync at span
    edges, the LOG>=1/2 equivalent.
  * `device_seconds(fn)` — robust steady-state timing of a jitted callable
    (forces a tiny transfer; block_until_ready alone has proven unreliable
    on experimental tunneled backends).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace into logdir."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(tree) -> None:
    jax.block_until_ready(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        leaf = leaves[0]
        jax.device_get(leaf[:1] if getattr(leaf, "ndim", 0) else leaf)


def device_seconds(fn: Callable, *args, iters: int = 3) -> float:
    """Best-of-iters steady-state seconds for fn(*args) (compiles first)."""
    _sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def annotate(name: str):
    """Named trace span (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
