"""Sort micro-benchmarks on the real chip: where do the milliseconds go?

Times (best of 3, steady-state) at N = 2^24 and 2^26, W=2 uint32 key words:
  xla        — jax.lax.sort baseline
  phaseA     — pallas block bitonic only (sorted 2^15 blocks)
  pallas     — full pallas hybrid (phase A + merge levels)
Writes one JSON line per measurement to stdout.

Run under nohup (remote compiles can take minutes):
  cd /root/repo && nohup python tools/bench_sort.py > /tmp/bench_sort.log 2>&1 &
"""

from __future__ import annotations

import functools
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

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )
    import jax.numpy as jnp

    from hysortk_tpu.ops import pallas_sort

    rng = np.random.default_rng(0)
    results = []

    for logn in (24, 26):
        n = 1 << logn
        w0 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
        w1 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))

        xla = jax.jit(
            lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False)
        )
        t = timeit(xla, w0, w1)
        results.append({"name": f"xla_2w_{logn}", "ms": round(t * 1e3, 1)})
        print(json.dumps(results[-1]), flush=True)

        pa = jax.jit(
            functools.partial(
                pallas_sort.block_bitonic_sort, n_words=2, block_rows=256
            )
        )
        t = timeit(pa, (w0, w1))
        results.append({"name": f"phaseA_2w_{logn}", "ms": round(t * 1e3, 1)})
        print(json.dumps(results[-1]), flush=True)

        full = jax.jit(
            functools.partial(
                pallas_sort.sort_words, block_rows=256, fuse_bits=4
            )
        )
        t = timeit(full, (w0, w1))
        results.append(
            {"name": f"pallas_2w_f4_{logn}", "ms": round(t * 1e3, 1)}
        )
        print(json.dumps(results[-1]), flush=True)

    with open("/tmp/bench_sort_results.json", "w") as f:
        json.dump(results, f)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
