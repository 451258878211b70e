"""Decompose the e2e per-batch cost on chip (round-4: warm e2e measured
~140-250 s PER 2^26 BATCH on the packed-wire path while bench.py's raw
path does 0.15 s — find the stage that differs).

    nohup python tools/diag_batch.py > /tmp/diag_batch.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def t(fn, tag, n=3):
    import jax

    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"stage": tag, "best_s": round(best, 3),
                      "first_s": round(first, 1)}), flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    from hysortk_tpu.config import KmerConfig
    from hysortk_tpu.io import supermer as supermer_io
    from hysortk_tpu.ops import wire
    from hysortk_tpu.pipeline import (
        _count_device,
        _count_device_packed,
        _count_device_packed_compact,
        resolved_cfg,
    )

    print("device:", jax.devices()[0], flush=True)
    cfg = KmerConfig(k=31, m=17, lower=2, upper=50, fuse_keybuild=True,
                     fuse_count=True, sort_backend="auto",
                     device_compact=True)
    n = 1 << 26
    read_len = 1024
    n_reads = (n - 16) // read_len
    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, 4, size=n, dtype=np.int8)
    lens = np.zeros(n_reads + 1, dtype=np.int32)
    lens[:n_reads] = read_len
    cfg = resolved_cfg(cfg, n)
    print("sort:", cfg.sort_backend, flush=True)

    # host pack
    t0 = time.perf_counter()
    packed = supermer_io.pack_codes_2bit(codes_np)
    print(json.dumps({"stage": "host_pack", "best_s":
                      round(time.perf_counter() - t0, 3)}), flush=True)

    packed_j = t(lambda: jax.device_put(jnp.asarray(packed)), "h2d_packed")
    lens_j = jax.device_put(jnp.asarray(lens))

    # decode alone
    dec = jax.jit(lambda p, l: wire.decode_block(p, l, cfg.k, n))
    t(lambda: dec(packed_j, lens_j), "decode_block")

    # full packed pipeline (no compact)
    t(lambda: _count_device_packed(
        packed_j, lens_j, cfg.k, n, 1, 2**31 - 1, cfg.sort_backend,
        cfg.fuse_keybuild, cfg.fuse_count), "packed_pipeline")

    # packed + compact payload sort (the e2e batch program)
    t(lambda: _count_device_packed_compact(
        packed_j, lens_j, cfg.k, n, 1, 2**31 - 1, cfg.sort_backend,
        cfg.fuse_keybuild, cfg.fuse_count), "packed_compact")

    # raw-input pipeline for reference (bench.py's program)
    valid = np.zeros(n, dtype=bool)
    valid[: n - cfg.k + 1] = True
    codes_j = jax.device_put(jnp.asarray(codes_np))
    valid_j = jax.device_put(jnp.asarray(valid))
    t(lambda: _count_device(
        codes_j, valid_j, cfg.k, 1, 2**31 - 1, cfg.sort_backend,
        cfg.fuse_keybuild, cfg.fuse_count), "raw_pipeline")


if __name__ == "__main__":
    main()
