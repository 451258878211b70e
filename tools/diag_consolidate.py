"""Span-level diagnosis of one device-resident consolidation cycle.

The 512 Mb e2e steady state (round 5) measured 7.8 s per consolidation at
group=2 / run_len=2^26 / W=2 — ~8x the device work the sort cost model
predicts (~1 s). This times each internal phase with explicit syncs:
merge dispatch, merge sync, per-chunk compact, arena appends, extraction.

    nohup python tools/diag_consolidate.py > /tmp/diag_consolidate.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    import jax.numpy as jnp

    from hysortk_tpu.config import KmerConfig
    from hysortk_tpu.runtime import scheduler as sched

    run_len = 1 << 26
    cfg = KmerConfig(k=31, m=17, lower=2, upper=50, sort_backend="pallas",
                     device_compact=True)
    rng = np.random.default_rng(0)

    def make_run(frac_valid=0.85):
        nv = int(run_len * frac_valid)
        w0 = np.sort(rng.integers(0, 1 << 32, size=nv, dtype=np.uint64)
                     ).astype(np.uint32)
        w1 = rng.integers(0, 1 << 32, size=nv, dtype=np.uint64
                          ).astype(np.uint32)
        full = np.full(run_len, 0xFFFFFFFF, dtype=np.uint32)
        a0, a1 = full.copy(), full.copy()
        a0[:nv], a1[:nv] = w0, w1
        cnt = np.zeros(run_len, np.uint32)
        cnt[:nv] = rng.integers(1, 5, size=nv)
        return (
            (jnp.asarray(a0), jnp.asarray(a1)), jnp.asarray(cnt)
        )

    print("building runs", flush=True)
    (r0w, r0c), (r1w, r1c) = make_run(), make_run()
    jax.block_until_ready([r0w, r0c, r1w, r1c])

    for rep in range(3):
        t0 = time.perf_counter()
        words_s, total, keep = sched._merge_runs_sum(
            ((r0w[0], r0w[1]), (r1w[0], r1w[1])), (r0c, r1c),
            jnp.int32(1), jnp.int32(2**31 - 1),
            words=2, run_len=run_len, pad_runs=0,
        )
        t_dispatch = time.perf_counter() - t0
        jax.block_until_ready(words_s)
        t_merge = time.perf_counter() - t0
        full = jnp.uint32(0xFFFFFFFF)
        arena_ws = tuple(
            jnp.full((3 * run_len,), full, jnp.uint32) for _ in range(2)
        )
        arena_c = jnp.zeros((3 * run_len,), jnp.uint32)
        jax.block_until_ready(arena_ws)
        t_arena = time.perf_counter() - t0
        off = 0
        chunk_times = []
        for ci in range(2):
            tc = time.perf_counter()
            cw, cp, n_kept = sched._compact_chunk(
                list(words_s), total, keep, jnp.int32(ci * run_len),
                sort_backend=cfg.sort_backend, chunk=run_len,
            )
            nk = int(jax.device_get(n_kept))
            chunk_times.append(round(time.perf_counter() - tc, 3))
            if nk:
                arena_ws, arena_c = sched._arena_append(
                    arena_ws, arena_c, tuple(cw), cp, jnp.int32(off)
                )
                off += nk
        t_chunks = time.perf_counter() - t0
        ws, c = sched._extract_run(arena_ws, arena_c, jnp.int32(0),
                                   run_len=run_len)
        jax.block_until_ready(c)
        t_total = time.perf_counter() - t0
        print({
            "rep": rep,
            "dispatch_s": round(t_dispatch, 3),
            "merge_sync_s": round(t_merge, 3),
            "arena_alloc_s": round(t_arena - t_merge, 3),
            "chunk_s": chunk_times,
            "after_chunks_s": round(t_chunks, 3),
            "total_s": round(t_total, 3),
            "kept": off,
        }, flush=True)


if __name__ == "__main__":
    main()
