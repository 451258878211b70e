"""Sharded-step decomposition at N virtual CPU devices (SCALING artifact):
full step vs local-only baseline, plus the exact-capacity exchange geometry
(elements each receive side processes / ships per n_local).

Round 3 measured the receive side at 2x n_local (capacity always rounded to
the next pow2); the exact-capacity geometry (ops/spill.py, round 4) ships
m + m/64 slots per cell and sentinel-pads only on the receive side. This
tool records both the measured step split and the static geometry ratio.

Run on a QUIET host (any TPU client starves CPU-mesh timing):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python tools/bench_decomposition.py --devices 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=2)
    ap.add_argument("--bases-per-shard", type=int, default=1 << 21)
    ap.add_argument("--read-len", type=int, default=1024)
    a = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from hysortk_tpu.config import KmerConfig
    from hysortk_tpu.io import fasta as fasta_io
    from hysortk_tpu.ops import spill as spill_ops
    from hysortk_tpu.parallel.mesh import make_mesh
    from hysortk_tpu.parallel.pipeline import (
        count_flat_sharded, range_capacity,
    )

    cfg = KmerConfig(k=31, m=17, lower=2, upper=50)
    n_dev = a.devices
    rng = np.random.default_rng(0)

    def make(n_shards):
        blocks_c, blocks_v = [], []
        n_reads = a.bases_per_shard // a.read_len
        for _ in range(n_shards):
            reads = rng.integers(
                0, 4, size=(n_reads, a.read_len), dtype=np.int8
            )
            c, v = fasta_io.flatten_for_device(
                reads.reshape(-1),
                np.full(n_reads, a.read_len, dtype=np.int64),
                cfg.k, cfg.pad_multiple,
            )
            blocks_c.append(c)
            blocks_v.append(v)
        block = max(b.shape[0] for b in blocks_c)
        codes = np.zeros((n_shards, block), np.int8)
        valid = np.zeros((n_shards, block), bool)
        for s in range(n_shards):
            codes[s, : blocks_c[s].shape[0]] = blocks_c[s]
            valid[s, : blocks_v[s].shape[0]] = blocks_v[s]
        return codes.reshape(-1), valid.reshape(-1), block

    def best3(fn):
        fn()  # warm
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t0)
        return b

    # Local-only baseline: the SAME per-shard problem on a 1-device mesh
    # (no-op exchange + single-run merge early-exit).
    codes1, valid1, _ = make(1)
    mesh1 = make_mesh(jax.devices()[:1])
    t_local = best3(lambda: count_flat_sharded(codes1, valid1, cfg, mesh1))

    # Full sharded step at n_dev.
    codesN, validN, block = make(n_dev)
    meshN = make_mesh(jax.devices()[:n_dev])
    t_full = best3(lambda: count_flat_sharded(codesN, validN, cfg, meshN))

    # Static geometry: slots shipped / processed per n_local.
    capacity = range_capacity(block, n_dev, cfg)
    m, sc = spill_ops.split_capacity(capacity)
    wire_ratio = n_dev * capacity / block
    merge_ratio = n_dev * 2 * m / block  # receive pads each run to 2m

    out = {
        "devices": n_dev,
        "bases_per_shard": a.bases_per_shard,
        "local_only_step_s": round(t_local, 3),
        "full_sharded_step_s": round(t_full, 3),
        "exchange_overhead_s": round(t_full - t_local, 3),
        "capacity_per_cell": capacity,
        "cell_split_m_sc": [m, sc],
        "wire_slots_per_n_local": round(wire_ratio, 3),
        "receive_merge_elems_per_n_local": round(merge_ratio, 3),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
