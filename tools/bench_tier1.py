"""Tier-1 candidate sweep: small-executable pipeline configs for bench.py's
insurance tier. Tier 1 must warm in well under a minute with a hot
.jax_cache (the member-sort tier's ~24 MB executable costs 200-1300 s of
per-process finalization depending on tunnel weather), so only XLA-sort
pipelines with at most the small Pallas keybuild/count kernels qualify.
This measures each candidate's sustained throughput AND caches its
programs so the driver's bench run pays loads only.

    nohup python tools/bench_tier1.py > /tmp/bench_tier1.log 2>&1 &
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
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    bench_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    from hysortk_tpu.config import KmerConfig
    from hysortk_tpu.pipeline import _count_device

    print("device:", jax.devices()[0], flush=True)

    cases = [
        # (log2 flat, fuse_keybuild, fuse_count)
        (23, False, False),  # the current tier 1 (measured 373M)
        (23, True, True),
        (24, True, True),
        (25, True, True),
    ]
    for logn, fkb, fc in cases:
        cfg = KmerConfig(k=31, m=17, lower=2, upper=50, fuse_keybuild=fkb,
                         fuse_count=fc, sort_backend="xla")
        total_bases = (1 << logn) - 8192
        codes, valid = bench_mod.make_input(total_bases, 1024, cfg.k)
        n_kmers = int(valid.sum())
        codes_j = jax.device_put(jax.numpy.asarray(codes, jax.numpy.int8))
        valid_j = jax.device_put(jax.numpy.asarray(valid))
        run = lambda: _count_device(
            codes_j, valid_j, cfg.k, cfg.lower, cfg.upper,
            cfg.sort_backend, cfg.fuse_keybuild, cfg.fuse_count,
        )
        t0 = time.perf_counter()
        jax.device_get(run()[1][:8])
        first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run() for _ in range(8)]
            jax.block_until_ready(outs)
            jax.device_get(outs[-1][1][:8])
            best = min(best, (time.perf_counter() - t0) / 8)
            del outs
        print(json.dumps({
            "flat": f"2^{logn}", "fuse_keybuild": fkb, "fuse_count": fc,
            "kmers_per_sec": round(n_kmers / best),
            "ms_per_batch": round(best * 1e3, 2),
            "first_call_s": round(first, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
