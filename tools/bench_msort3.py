"""Chip benchmark: member sort v3 (fused cross+tail + xor swap masks).

Measures the full member sort at rows in {512, 1024} on 2^26 and 2^24
2-word keys vs lax.sort, asserting bit-equality. Run:
  nohup python tools/bench_msort3.py > /tmp/msort_v3.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    from hysortk_tpu.ops import pallas_sort

    print("device:", jax.devices()[0], flush=True)

    def timed(fn, *args, reps=3):
        out = fn(*args)
        jax.block_until_ready(out)
        first = out[0] if isinstance(out, (list, tuple)) else out
        jax.device_get(first[:8])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            jax.device_get((out[0] if isinstance(out, (list, tuple)) else out)[:8])
            best = min(best, time.perf_counter() - t0)
        return best, out

    for logn in (26, 24):
        n = 1 << logn
        rng = np.random.default_rng(7)
        w0 = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        w1 = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))

        xla = jax.jit(
            lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False)
        )
        t_xla, out_x = timed(xla, w0, w1)
        print(f"2^{logn} lax.sort 2op: {t_xla*1e3:.1f} ms", flush=True)
        ref = [np.asarray(o) for o in out_x]

        for rows in (512, 1024):
            full = jax.jit(
                lambda a, b, r=rows: pallas_sort.sort_words(
                    [a, b], block_rows=r, formulation="member"
                )[0]
            )
            t_f, out_m = timed(full, w0, w1)
            print(
                f"2^{logn} full member v3 rows={rows}: {t_f*1e3:.1f} ms",
                flush=True,
            )
            ok = all(
                np.array_equal(np.asarray(out_m[i]), ref[i]) for i in range(2)
            )
            print(f"2^{logn} rows={rows}: == lax.sort {'OK' if ok else 'MISMATCH'}",
                  flush=True)
            assert ok


if __name__ == "__main__":
    main()
