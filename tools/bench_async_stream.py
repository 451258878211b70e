"""Sharded-streaming async-window throughput sweep (VERDICT round-3 #6).

Measures count_reads_sharded_streaming wall time at async_depth=1 (per-batch
settle — the round-3 behavior) vs the production window (4, 8) on the
8-virtual-device CPU mesh, same input, and asserts the results are equal.

MUST run on a quiet host (no TPU client, no compiles): the virtual-device
mesh oversubscribes the cores, so any background load shows up as fake
scaling loss.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python tools/bench_async_stream.py

Prints one JSON line per depth. Reference role: the double-buffered
MPI_Ialltoall rounds overlap packing, flight, and parse
(/root/reference/src/kmerops.cpp:906-1007).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from hysortk_tpu.config import KmerConfig
    from hysortk_tpu.parallel.mesh import make_mesh
    from hysortk_tpu.parallel.pipeline import count_reads_sharded_streaming

    mesh = make_mesh(jax.devices()[:8])
    cfg = KmerConfig(k=31, m=17, lower=2, upper=50)

    # Coverage-style reads (window sampling of a synthetic genome) so the
    # [L,U] filter keeps most keys and the merge has real work per batch.
    rng = np.random.default_rng(7)
    read_len = 512
    total_bases = 1 << 23
    n_reads = total_bases // read_len
    genome = rng.integers(0, 4, size=total_bases // 8, dtype=np.int8)
    starts = rng.integers(0, genome.size - read_len, size=n_reads)
    reads = genome[starts[:, None] + np.arange(read_len)[None, :]]
    codes = np.ascontiguousarray(reads.reshape(-1))
    lengths = np.full(n_reads, read_len, dtype=np.int64)
    batch_bases = 1 << 20  # 8 batches through the window

    results = {}
    timings = {}
    for depth in (1, 4, 8):
        # Warm-up (compiles shared across depths after the first).
        kl, hist = count_reads_sharded_streaming(
            codes, lengths, cfg, batch_bases, mesh, async_depth=depth
        )
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            kl, hist = count_reads_sharded_streaming(
                codes, lengths, cfg, batch_bases, mesh, async_depth=depth
            )
            best = min(best, time.perf_counter() - t0)
        results[depth] = (kl.as_dict(), hist.tolist())
        timings[depth] = best
        print(
            json.dumps(
                {
                    "async_depth": depth,
                    "wall_s": round(best, 3),
                    "distinct_kept": len(kl),
                    "speedup_vs_depth1": round(timings[1] / best, 3),
                }
            ),
            flush=True,
        )

    assert results[4][0] == results[1][0], "depth changed results"
    assert results[8][0] == results[1][0], "depth changed results"
    assert results[4][1] == results[1][1], "depth changed histogram"
    print(json.dumps({"equal_across_depths": True}), flush=True)


if __name__ == "__main__":
    main()
