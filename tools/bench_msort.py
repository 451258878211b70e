"""Chip benchmark: member-formulation Pallas sort vs roll formulation vs
lax.sort, 2-word keys. Also phase-A-only timings to attribute the win.

Run on the TPU host:  nohup python tools/bench_msort.py > /tmp/msort.log 2>&1 &
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
    from hysortk_tpu.ops import pallas_msort, pallas_sort

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

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

    for logn in (24, 26):
        n = 1 << logn
        rng = np.random.default_rng(7)
        w0 = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        w1 = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))

        xla = jax.jit(
            lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False)
        )
        t_xla, out_x = timed(xla, w0, w1)
        print(f"2^{logn} lax.sort 2op: {t_xla*1e3:.1f} ms", flush=True)

        pa_roll = jax.jit(
            lambda a, b: pallas_sort.block_bitonic_sort([a, b], 2, 256)
        )
        t_par, _ = timed(pa_roll, w0, w1)
        print(f"2^{logn} phaseA roll: {t_par*1e3:.1f} ms", flush=True)

        pa_mem = jax.jit(
            lambda a, b: pallas_msort.block_sort_member([a, b], 2)
        )
        t_pam, _ = timed(pa_mem, w0, w1)
        print(f"2^{logn} phaseA member: {t_pam*1e3:.1f} ms", flush=True)

        full_roll = jax.jit(
            lambda a, b: pallas_sort.sort_words(
                [a, b], formulation="roll"
            )[0]
        )
        t_fr, _ = timed(full_roll, w0, w1)
        print(f"2^{logn} full roll: {t_fr*1e3:.1f} ms", flush=True)

        full_mem = jax.jit(
            lambda a, b: pallas_sort.sort_words(
                [a, b], formulation="member"
            )[0]
        )
        t_fm, out_m = timed(full_mem, w0, w1)
        print(f"2^{logn} full member: {t_fm*1e3:.1f} ms", flush=True)

        # bit-exactness vs lax.sort
        for i in range(2):
            a = np.asarray(out_m[i])
            b = np.asarray(out_x[i])
            assert np.array_equal(a, b), f"mismatch word {i} at 2^{logn}"
        print(f"2^{logn} member == lax.sort: OK", flush=True)


if __name__ == "__main__":
    main()
