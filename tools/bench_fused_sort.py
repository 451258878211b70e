"""Chip benchmark: keybuild-fused phase A (sort_codes_fused) vs the
unfused pair (canonical_keys_fused + sort_words), plus a block_rows sweep.

Run on the real TPU (nohup, poll the log):
    python tools/bench_fused_sort.py [--n 67108864] [--rows 512 1024]

Prints one JSON line per configuration. Validates equality on-device
before timing (bit-identical sorted words)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 26)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--rows", type=int, nargs="+", default=[512, 1024])
    ap.add_argument("--check-n", type=int, default=1 << 20)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    from hysortk_tpu.ops import keybuild, pallas_sort

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    def make(n):
        codes = rng.integers(0, 4, size=n).astype(np.int8)
        valid = np.ones(n, dtype=bool)
        valid[-(a.k - 1):] = False
        return jnp.asarray(codes), jnp.asarray(valid)

    # 1) Small equality check on chip (compiles the fused kernel at a
    #    cheap size first — never start with the big program).
    codes_s, valid_s = make(a.check_n)
    fused = jax.jit(
        lambda c, v: tuple(pallas_sort.sort_codes_fused(c, v, a.k))
    )
    unfused = jax.jit(
        lambda c, v: tuple(
            pallas_sort.sort_words(
                keybuild.canonical_keys_fused(c, v, a.k)
            )[0]
        )
    )
    got = jax.device_get(fused(codes_s, valid_s))
    want = jax.device_get(unfused(codes_s, valid_s))
    for g, w in zip(got, want):
        assert np.array_equal(g, w), "fused != unfused on chip"
    print(json.dumps({"check": "fused==unfused", "n": a.check_n,
                      "ok": True}), flush=True)

    # 2) Timing at the big size, sweeping block_rows.
    codes_b, valid_b = make(a.n)

    def time_fn(fn, tag):
        t0 = time.perf_counter()
        out = fn(codes_b, valid_b)
        jax.block_until_ready(out)
        _ = jax.device_get(out[0][:8])
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(codes_b, valid_b)
            jax.block_until_ready(out)
            _ = jax.device_get(out[0][:8])
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "config": tag, "n": a.n, "best_ms": round(best * 1e3, 1),
            "mkeys_per_s": round(a.n / best / 1e6, 1),
            "first_call_s": round(compile_s, 1),
        }), flush=True)
        return best

    for rows in a.rows:
        time_fn(
            jax.jit(lambda c, v, r=rows: tuple(
                pallas_sort.sort_codes_fused(c, v, a.k, block_rows=r)
            )),
            f"fused_rows{rows}",
        )
    time_fn(unfused, "unfused_rows512")


if __name__ == "__main__":
    main()
