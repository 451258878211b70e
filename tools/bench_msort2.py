"""Chip benchmark: v2 member-tile Pallas sort, block-size sweep vs lax.sort.

The v2 kernels (ops/pallas_msort.py) hold each block as named (8,128) vreg
tiles; the paid (rolled) stages per phase-A network are constant, so bigger
blocks should convert whole merge levels into cheap member stages. This
script measures phase A and the full sort at block_rows in {256, 512, 1024,
2048} (B = 2^15..2^18) on 2^26 2-word keys, asserting bit-equality with
lax.sort at every geometry.

Run on the TPU host:  nohup python tools/bench_msort2.py > /tmp/msort_v2.log 2>&1 &
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

    logn = 26
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

    for rows in (256, 512, 1024, 2048):
        log_b = int(rows * 128).bit_length() - 1
        try:
            pa = jax.jit(
                lambda a, b, r=rows, lb=log_b: pallas_msort.block_sort_member(
                    [a, b], 2, lb
                )
            )
            t_pa, _ = timed(pa, w0, w1)
            print(
                f"2^{logn} phaseA member rows={rows}: {t_pa*1e3:.1f} ms",
                flush=True,
            )
            full = jax.jit(
                lambda a, b, r=rows: pallas_sort.sort_words(
                    [a, b], block_rows=r, formulation="member"
                )[0]
            )
            t_f, out_m = timed(full, w0, w1)
            print(
                f"2^{logn} full member rows={rows}: {t_f*1e3:.1f} ms",
                flush=True,
            )
            for i in range(2):
                assert np.array_equal(np.asarray(out_m[i]), ref[i]), (
                    rows,
                    i,
                )
            print(f"rows={rows}: == lax.sort OK", flush=True)
        except Exception as e:  # compile/VMEM failures at big blocks
            print(f"rows={rows}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
