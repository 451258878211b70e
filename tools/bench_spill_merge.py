"""Chip microbench: exact-capacity receive side vs the legacy 2x plane
(VERDICT round-3 #5 — "kill the 2x receive-side merge inflation").

Simulates the range exchange's receive side at S=8 senders and 2^26
logical elements per shard (the all_to_all replaced by identity — one
real chip):

  legacy  — capacity = next_pow2(1.6 * mean) = 2 * mean: merge S runs of
            2*m where each run is half real keys, half 0xFFFFFFFF
            sentinel pad, then run-length count over the 2x plane.
  exact   — capacity = m + m/64 on the WIRE (ops/spill.py); the receive
            side sentinel-pads each (m + sc)-slot run to 2m and feeds the
            same single merge as legacy. Device cost == legacy; the win
            is the ~2x all_to_all byte saving.
  History (both deleted): a 1x main plane + spill folded in by an extra
  top-level merge measured 566.0 ms; folding by lexicographic binary
  search + scatter-add measured 1329.6 ms. The padded single merge
  (331.9 ms) beats every plane-splitting formulation.

Run on the TPU host (single client, generous budget):
    nohup python tools/bench_spill_merge.py > /tmp/bench_spill_merge.log 2>&1 &
Writes tools/bench_spill_merge.json.

Reference role: exact receive preallocation, src/kmerops.cpp:439-471.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

S = 8
LOG_M = 23  # per-sender main slots; S * m = 2^26 logical elements
W = 2  # K=31 key words


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    from hysortk_tpu.ops import count as count_ops
    from hysortk_tpu.ops import merge as merge_ops

    print("device:", jax.devices()[0], flush=True)
    m = 1 << LOG_M
    sc = m // 64
    rng = np.random.default_rng(5)

    def sorted_run(n):
        w0 = np.sort(rng.integers(0, 2**32, n, dtype=np.uint32))
        # Second word arbitrary: lexicographic order is dominated by w0
        # for random data (ties negligible at this density).
        w1 = rng.integers(0, 2**32, n, dtype=np.uint32)
        return w0, w1

    # Main planes: S sorted runs, concatenated run-major (merge input).
    runs = [sorted_run(m) for _ in range(S)]
    main_w0 = np.concatenate([r[0] for r in runs])
    main_w1 = np.concatenate([r[1] for r in runs])

    # Legacy planes: each run = m real + m sentinel pad, run length 2m.
    FULL = np.uint32(0xFFFFFFFF)
    leg_w0 = np.concatenate(
        [np.concatenate([r[0], np.full(m, FULL)]) for r in runs]
    )
    leg_w1 = np.concatenate(
        [np.concatenate([r[1], np.full(m, FULL)]) for r in runs]
    )

    # Spill planes: (S, sc) sorted tails (fully occupied — worst case;
    # production spill lanes are mostly sentinel).
    sp = [sorted_run(sc) for _ in range(S)]
    sp_w0 = np.concatenate([r[0] for r in sp])
    sp_w1 = np.concatenate([r[1] for r in sp])

    j = jnp.asarray

    @jax.jit
    def exact_path(mw0, mw1, sw0, sw1):
        # The production formulation: (m + sc)-slot received runs,
        # sentinel-padded to 2m, one merge (pipeline._range_exchange_merge).
        T = mw0.shape[0]
        m_run = T // S
        full = jnp.uint32(0xFFFFFFFF)
        scn = sw0.shape[0] // S

        def pad_runs(main, tail, fillv):
            rows_m = main.reshape(S, m_run)
            rows_t = tail.reshape(S, scn)
            fill = jnp.full((S, m_run - scn), fillv, jnp.uint32)
            return jnp.concatenate([rows_m, rows_t, fill], 1).reshape(-1)

        lw0 = pad_runs(mw0, sw0, full)
        lw1 = pad_runs(mw1, sw1, full)
        merged = merge_ops.merge_sorted_runs([lw0, lw1], 2, 2 * m_run)
        svalid = merged[0] != full
        head, cnt = count_ops.run_length_count(svalid, merged)
        keep = count_ops.frequency_filter(head, cnt, 1, 0xFFFF)
        return merged[0], cnt, keep

    @jax.jit
    def legacy_path(lw0, lw1):
        merged = merge_ops.merge_sorted_runs(
            [lw0, lw1], 2, lw0.shape[0] // S
        )
        svalid = merged[0] != jnp.uint32(0xFFFFFFFF)
        head, cnt = count_ops.run_length_count(svalid, merged)
        keep = count_ops.frequency_filter(head, cnt, 1, 0xFFFF)
        return merged[0], cnt, keep

    def bench(fn, args, tag):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        _ = jax.device_get(out[0][:8])
        first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            _ = jax.device_get(out[0][:8])
            best = min(best, time.perf_counter() - t0)
        print(
            json.dumps(
                {"config": tag, "best_ms": round(best * 1e3, 1),
                 "first_call_s": round(first, 1)}
            ),
            flush=True,
        )
        return best

    # Small-shape probe compiles first (never start with the big program).
    bench(exact_path, (j(main_w0[: S * 1024]), j(main_w1[: S * 1024]),
                       j(sp_w0[: S * 64]), j(sp_w1[: S * 64])),
          "exact_probe")
    bench(legacy_path, (j(leg_w0[: S * 2048]), j(leg_w1[: S * 2048])),
          "legacy_probe")

    t_exact = bench(
        exact_path, (j(main_w0), j(main_w1), j(sp_w0), j(sp_w1)), "exact"
    )
    t_leg = bench(legacy_path, (j(leg_w0), j(leg_w1)), "legacy")
    out = {
        "S": S, "m": m, "spill": sc,
        "exact_ms": round(t_exact * 1e3, 1),
        "legacy_ms": round(t_leg * 1e3, 1),
        "legacy_over_exact": round(t_leg / t_exact, 3),
        "fold_v1_ms": 1329.6, "merge_fold_ms": 566.0,
    }
    with open(os.path.join(REPO, "tools", "bench_spill_merge.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
