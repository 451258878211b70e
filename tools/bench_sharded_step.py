"""Chip microbenchmark of the sharded step's exchange composition (VERDICT
round-2 weak #3): pack_sorted_ranges' (S, capacity) gather, mask_invalid_slots,
and the flatten + merge_sorted_runs receive side, at S=8 / 2^26 scale, with the
all_to_all replaced by identity (one real chip).

Also times an alternative pack formulation (S dynamic slices of a padded
array — contiguous copies instead of a 2-D gather) to decide which one the
production path should use if XLA lowers the gather generically.

Run on the TPU host:
    nohup python tools/bench_sharded_step.py > /tmp/bench_sharded_step.log 2>&1 &
Writes tools/bench_sharded_step.json.

Reference role: write_sendbufs/parse_recvbufs (src/kmerops.cpp:971-1007).
"""

import json
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
    from hysortk_tpu.ops import merge as merge_ops
    from hysortk_tpu.parallel import exchange

    LOGN = 26
    S = 8
    N = 1 << LOGN
    CAP = N // S  # 2^23, pow2 as in production

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(3)
    # A sorted shard of mixed keys: destinations are the top bits, so the
    # segment boundaries land roughly uniformly — the production layout.
    w0 = np.sort(rng.integers(0, 2**32, N, dtype=np.uint32))
    w1 = rng.integers(0, 2**32, N, dtype=np.uint32)
    jw0, jw1 = jnp.asarray(w0), jnp.asarray(w1)
    # Range boundaries over the full u32 space (S equal slices).
    bnd = (np.arange(1, S, dtype=np.uint64) * (1 << 32) // S).astype(np.uint32)

    def offsets_of(a):
        inner = jnp.searchsorted(a, jnp.asarray(bnd), side="left").astype(
            jnp.int32
        )
        return jnp.concatenate(
            [jnp.zeros(1, jnp.int32), inner, jnp.asarray([N], jnp.int32)]
        )

    def timed(fn, *args, reps=3):
        out = fn(*args)
        jax.block_until_ready(out)
        first = out
        while isinstance(first, (list, tuple)):
            first = first[0]
        jax.device_get(first.reshape(-1)[:8])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            f = out
            while isinstance(f, (list, tuple)):
                f = f[0]
            jax.device_get(f.reshape(-1)[:8])
            best = min(best, time.perf_counter() - t0)
        return best, out

    results = {}

    # Fixed host<->device sync overhead on this tunneled backend: a no-op
    # round trip, subtracted to get "true" device-time ratios.
    t, _ = timed(jax.jit(lambda a: a + 1), jnp.zeros(8, jnp.uint32))
    results["sync_overhead_ms"] = t * 1e3
    print(f"sync overhead: {t*1e3:.1f} ms", flush=True)

    # Baseline: the local sort this composition must stay small next to.
    t, _ = timed(
        jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False)),
        jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32)),
        jw1,
    )
    results["local_sort_ms"] = t * 1e3
    print(f"local sort 2op: {t*1e3:.1f} ms", flush=True)

    # Production pack (pack_sorted_ranges = S dynamic slices of a
    # sentinel-padded array since the round-3 fix) + validity mask.
    def pack_production(a, b):
        off = offsets_of(a)
        sw, _, counts, _ = exchange.pack_sorted_ranges(
            [a, b], [], off, S, CAP
        )
        slot_j = jax.lax.broadcasted_iota(jnp.int32, (S, CAP), 1)
        valid = slot_j < counts[:, None]
        return exchange.mask_invalid_slots(sw, valid)

    t, out_d = timed(jax.jit(pack_production), jw0, jw1)
    results["pack_dynslice_ms"] = t * 1e3
    print(f"pack (production/dynslice): {t*1e3:.1f} ms", flush=True)

    # Legacy formulation this replaced: (S, CAP) row-segment gather.
    # Chip-measured 3760 ms vs 61 — kept here as the regression witness.
    def pack_gather(a, b):
        off = offsets_of(a)
        n = a.shape[0]
        slot_j = jax.lax.broadcasted_iota(jnp.int32, (S, CAP), 1)
        src = jnp.minimum(off[:-1][:, None] + slot_j, n - 1)
        sw = [a[src], b[src]]
        counts = jnp.diff(off)
        valid = slot_j < counts[:, None]
        return exchange.mask_invalid_slots(sw, valid)

    t, out_g = timed(jax.jit(pack_gather), jw0, jw1)
    results["pack_gather_ms"] = t * 1e3
    print(f"pack (legacy gather): {t*1e3:.1f} ms", flush=True)

    # Equality of the two formulations (valid slots only — both mask).
    for g, d in zip(out_g, out_d):
        assert np.array_equal(np.asarray(g), np.asarray(d)), "pack mismatch"
    print("pack formulations agree", flush=True)

    # Receive side: flatten + merge of S sorted runs (each row of the packed
    # buffer is ascending with a sentinel tail — same as post-a2a rows).
    rows = [np.asarray(o) for o in out_g]

    def merge_side(a2d, b2d):
        flat = [a2d.reshape(-1), b2d.reshape(-1)]
        return merge_ops.merge_sorted_runs(flat, 2, CAP)

    t, merged = timed(
        jax.jit(merge_side), jnp.asarray(rows[0]), jnp.asarray(rows[1])
    )
    results["merge_ms"] = t * 1e3
    print(f"merge (S runs of CAP): {t*1e3:.1f} ms", flush=True)

    # Sanity: merged keys equal a full sort of the masked buffer.
    ref0 = np.sort(rows[0].reshape(-1), kind="stable")
    assert np.array_equal(np.asarray(merged[0]), ref0), "merge mismatch"

    sync = results["sync_overhead_ms"]
    true = lambda ms: max(ms - sync, 0.0)
    pack_ratio = true(results["pack_dynslice_ms"]) / true(
        results["local_sort_ms"]
    )
    results["pack_over_sort_true"] = pack_ratio
    # The merge is not overhead on top of a sort — it REPLACES the receive
    # side's re-sort (1.46-1.67x cheaper, CLAUDE.md); reported separately.
    results["merge_over_resort_true"] = true(results["merge_ms"]) / true(
        results["local_sort_ms"]
    )
    print(
        f"pack = {pack_ratio*100:.1f}% of local sort (true, sync-corrected; "
        f"gate < 15%); merge replaces the receive re-sort at "
        f"{results['merge_over_resort_true']*100:.0f}% of its cost",
        flush=True,
    )

    with open(
        os.path.join(os.path.dirname(__file__), "bench_sharded_step.json"),
        "w",
    ) as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
