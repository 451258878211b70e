"""Decisive XLA sort-shape experiments on the real chip.

Answers two architecture questions for the sort redesign:
  1. Does lax.sort cost scale with the number of KEY operands or with
     total operand bytes? (1-key+riders vs all-keys at same width)
  2. Are batched row sorts (R, C) much cheaper than one (R*C,) sort?
     (the partition-then-batched-sort / RADULS architecture)

Run: nohup python tools/bench_sort_xla.py > /tmp/bench_sort_xla.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args):
    import jax

    def sync(out):
        jax.block_until_ready(out)
        first = jax.tree.leaves(out)[0]
        jax.device_get(first.reshape(-1)[:8])

    sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )

    rng = np.random.default_rng(0)
    n = 1 << 26
    a = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    c = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))

    def rec(name, t):
        print(json.dumps({"name": name, "ms": round(t * 1e3, 1)}), flush=True)

    # 1-key vs 2-key at 2 operands
    s1 = jax.jit(lambda x, y: jax.lax.sort((x, y), num_keys=1, is_stable=False))
    rec("xla_2op_1key", timeit(s1, a, b))
    s2 = jax.jit(lambda x, y: jax.lax.sort((x, y), num_keys=2, is_stable=False))
    rec("xla_2op_2key", timeit(s2, a, b))

    # 3 operands: 1 vs 3 keys
    s31 = jax.jit(
        lambda x, y, z: jax.lax.sort((x, y, z), num_keys=1, is_stable=False)
    )
    rec("xla_3op_1key", timeit(s31, a, b, c))
    s33 = jax.jit(
        lambda x, y, z: jax.lax.sort((x, y, z), num_keys=3, is_stable=False)
    )
    rec("xla_3op_3key", timeit(s33, a, b, c))

    # single operand
    s0 = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1, is_stable=False))
    rec("xla_1op_1key", timeit(s0, a))

    # batched row sorts, same total: (rows, cols), 2 operands 2 keys
    for rows_log in (6, 10, 12):
        rows = 1 << rows_log
        cols = n // rows
        a2 = a.reshape(rows, cols)
        b2 = b.reshape(rows, cols)
        sb = jax.jit(
            lambda x, y: jax.lax.sort(
                (x, y), dimension=1, num_keys=2, is_stable=False
            )
        )
        rec(f"xla_rows{rows}_2key", timeit(sb, a2, b2))

    # NOTE: an XLA reshape-network merge stage was tried here and OOM'd at
    # compile time (the (.., 2, j) views tile-pad up to 128/j x — see the
    # CLAUDE.md ledger); the Pallas merge replaced it
    # (tools/bench_merge_tpu.py).
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
