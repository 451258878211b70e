"""Stage-by-stage breakdown of the single-chip bench pipeline at 2^26,
plus input-size scaling (fixed per-call sync overhead amortization).

Run: nohup python tools/bench_breakdown.py > /tmp/bench_breakdown.log 2>&1 &
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
    import functools

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )
    from bench import make_input
    from hysortk_tpu.ops import keybuild, pallas_count
    from hysortk_tpu.ops import sort as sort_ops
    from hysortk_tpu.pipeline import _count_device

    def rec(name, t, n=None):
        row = {"name": name, "ms": round(t * 1e3, 1)}
        if n:
            row["mkmers_per_s"] = round(n / t / 1e6, 1)
        print(json.dumps(row), flush=True)

    k = 31
    codes, valid = make_input(1 << 26, 1024, k)
    n_kmers = int(valid.sum())
    cj = jax.device_put(jnp.asarray(codes, jnp.int8))
    vj = jax.device_put(jnp.asarray(valid))

    # Stage 1: fused keybuild alone.
    kb = jax.jit(functools.partial(keybuild.canonical_keys_fused, k=k))
    rec("keybuild_fused", timeit(kb, cj, vj))

    # Stage 1+2: keybuild + sort.
    @jax.jit
    def kb_sort(c, v):
        marked = keybuild.canonical_keys_fused(c, v, k)
        _, w, _ = sort_ops.sort_marked(marked, backend="xla")
        return tuple(w)

    rec("keybuild_sort", timeit(kb_sort, cj, vj))

    # Full pipeline (bench configuration).
    full = lambda: _count_device(cj, vj, k, 2, 50, "xla", True, True)
    rec("full_fused", timeit(full), n_kmers)

    # Full without fused count (XLA count instead).
    full_nc = lambda: _count_device(cj, vj, k, 2, 50, "xla", True, False)
    rec("full_xla_count", timeit(full_nc), n_kmers)

    # Full without fused keybuild.
    full_nk = lambda: _count_device(cj, vj, k, 2, 50, "xla", False, True)
    rec("full_xla_keybuild", timeit(full_nk), n_kmers)

    # Empty-ish op to estimate fixed sync overhead.
    tiny = jax.jit(lambda c: c[:128].astype(jnp.int32) + 1)
    rec("sync_overhead_floor", timeit(tiny, cj))

    # Input-size scaling of the full pipeline.
    for logn in (27, 28):
        codes2, valid2 = make_input(1 << logn, 1024, k)
        n2 = int(valid2.sum())
        c2 = jax.device_put(jnp.asarray(codes2, jnp.int8))
        v2 = jax.device_put(jnp.asarray(valid2))
        f2 = lambda: _count_device(c2, v2, k, 2, 50, "xla", True, True)
        try:
            rec(f"full_fused_{logn}", timeit(f2), n2)
        except Exception as e:  # OOM guard
            print(json.dumps({"name": f"full_fused_{logn}", "error": str(e)[:200]}), flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
