"""Real-TPU validation + timing of the Pallas sorted-run merge.

The range exchange's receive side merges S sorted runs (ops/merge.py ->
pallas_sort.merge_runs). Multi-chip hardware is unavailable, so this drives
the merge directly at multi-chip-realistic shapes (8 runs of 2^23 — one
shard's receive buffer at 2^26 global over 8 chips) and checks bit-equality
vs lax.sort plus the speedup over a full re-sort.

Run: nohup python tools/bench_merge_tpu.py > /tmp/bench_merge.log 2>&1 &
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
        jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:8])

    sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )
    from hysortk_tpu.ops import pallas_sort

    rng = np.random.default_rng(0)
    s, run_len = 8, 1 << 23
    n = s * run_len
    w0 = rng.integers(0, 2**32, n, dtype=np.uint32)
    w1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    # Sort each run (host, once) + sentinel tails like masked exchange slots.
    for r in range(s):
        sl = slice(r * run_len, (r + 1) * run_len)
        tail = int(rng.integers(0, run_len // 8))
        if tail:
            w0[(r + 1) * run_len - tail : (r + 1) * run_len] = 0xFFFFFFFF
            w1[(r + 1) * run_len - tail : (r + 1) * run_len] = 0xFFFFFFFF
        order = np.lexsort((w1[sl], w0[sl]))
        w0[sl], w1[sl] = w0[sl][order], w1[sl][order]
    a, b = jnp.asarray(w0), jnp.asarray(w1)

    merge = jax.jit(
        functools.partial(pallas_sort.merge_runs, n_words=2, run_len=run_len)
    )
    m0, m1 = merge([a, b])
    full = jax.jit(
        lambda x, y: jax.lax.sort((x, y), num_keys=2, is_stable=False)
    )
    f0, f1 = full(a, b)
    ok = bool(
        jnp.array_equal(m0, f0).item() and jnp.array_equal(m1, f1).item()
    )
    print(json.dumps({"name": "merge_equal_lax_sort", "ok": ok}), flush=True)
    assert ok

    t_merge = timeit(merge, [a, b])
    t_sort = timeit(full, a, b)
    print(
        json.dumps(
            {
                "name": "merge8x2^23_vs_resort",
                "merge_ms": round(t_merge * 1e3, 1),
                "resort_ms": round(t_sort * 1e3, 1),
                "speedup": round(t_sort / t_merge, 2),
            }
        ),
        flush=True,
    )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
