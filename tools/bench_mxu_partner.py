"""Chip A/B: xor-partner via rolls vs constant permutation matmuls (MXU)
in the member sort's rolled stages (HYSORTK_MXU_PARTNER).

    HYSORTK_MXU_PARTNER=0|1 nohup python tools/bench_mxu_partner.py ...
"""

from __future__ import annotations

import json
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

    from hysortk_tpu.ops import pallas_msort, pallas_sort

    mode = pallas_msort._PARTNER
    print("partner mode:", mode, flush=True)
    rng = np.random.default_rng(0)
    for logn in (24, 26):
        n = 1 << logn
        w0 = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
        w1 = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
        a = [jax.device_put(jnp.asarray(w0)), jax.device_put(jnp.asarray(w1))]

        sort_jit = jax.jit(
            lambda ws: pallas_sort.sort_words(ws, formulation="member")[0]
        )
        run = lambda: sort_jit(a)
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        first = time.perf_counter() - t0
        # Correctness spot check once per size (vs numpy lexsort prefix).
        got0 = np.asarray(out[0][: 1 << 20])
        order = np.lexsort((w1, w0))
        ok = bool(np.array_equal(got0, w0[order][: 1 << 20]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run()
            jax.block_until_ready(out)
            jax.device_get(out[0][:8])
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "mode": mode, "n": f"2^{logn}",
            "sort_s": round(best, 4), "first_s": round(first, 1),
            "prefix_ok": ok,
        }), flush=True)


if __name__ == "__main__":
    main()
