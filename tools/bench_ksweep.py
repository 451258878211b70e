"""K sweep on chip with the production (round-4) pipeline: the README's
K=15/55 rows date from round 2 (pre-member-sort); this re-measures them
with sort=auto (the Pallas member sort at this scale) using exactly
bench.py's methodology — exact-2^26 flat, PIPE_DEPTH async batches/sync.

    nohup python tools/bench_ksweep.py > /tmp/bench_ksweep.log 2>&1 &
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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", type=int, nargs="+", default=[15, 31, 55])
    a = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    sys.path.insert(0, REPO)
    from hysortk_tpu.config import KmerConfig
    from hysortk_tpu.pipeline import _count_device, resolved_cfg

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    bench_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)

    print("device:", jax.devices()[0], flush=True)
    for k in a.ks:
        cfg = KmerConfig(k=k, m=7 if k == 15 else 17, lower=2, upper=50,
                         fuse_keybuild=True, fuse_count=True,
                         sort_backend="auto")
        total_bases = (1 << 26) - 8192
        codes, valid = bench_mod.make_input(total_bases, 1024, k)
        n_kmers = int(valid.sum())
        codes_j = jax.device_put(jax.numpy.asarray(codes, jax.numpy.int8))
        valid_j = jax.device_put(jax.numpy.asarray(valid))
        cfg = resolved_cfg(cfg, codes.size)

        run = lambda: _count_device(
            codes_j, valid_j, cfg.k, cfg.lower, cfg.upper,
            cfg.sort_backend, cfg.fuse_keybuild, cfg.fuse_count,
        )
        t0 = time.perf_counter()
        jax.device_get(run()[1][:8])
        first = time.perf_counter() - t0
        # In-flight outputs cost (W+2) x 268 MB each at 2^26; the depth
        # rule scales the window down with W so K=55 never OOMs by
        # configuration (was a manual "use 3" note).
        from hysortk_tpu.runtime.scheduler import suggest_pipe_depth

        depth = suggest_pipe_depth(codes.size, cfg.words)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run() for _ in range(depth)]
            jax.block_until_ready(outs)
            jax.device_get(outs[-1][1][:8])
            best = min(best, (time.perf_counter() - t0) / depth)
        print(json.dumps({
            "k": k, "sort": cfg.sort_backend, "pipe_depth": depth,
            "kmers_per_sec": round(n_kmers / best),
            "first_call_s": round(first, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
