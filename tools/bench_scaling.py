"""Weak-scaling harness: per-shard throughput over an N-device mesh.

The reference's scaling story is rank-count sweeps on a cluster; the TPU
analogue sweeps mesh sizes. On real hardware this measures ICI all_to_all
scaling; on a single host it can still validate the sharded pipeline at
N virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python tools/bench_scaling.py --devices 1 2 4 8

Prints one JSON line per mesh size: kmers/s, kmers/s/shard, and weak-scaling
efficiency vs the 1-device run (same per-shard problem size).
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
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--bases-per-shard", type=int, default=1 << 21)
    ap.add_argument("--read-len", type=int, default=1024)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from hysortk_tpu.config import KmerConfig
    from hysortk_tpu.parallel.mesh import make_mesh
    from hysortk_tpu.parallel.pipeline import count_flat_sharded
    from hysortk_tpu.io import fasta as fasta_io

    all_devs = jax.devices()
    sweep = args.devices or sorted(
        {n for n in (1, 2, 4, 8, len(all_devs)) if n <= len(all_devs)}
    )

    cfg = KmerConfig(k=31, m=17, lower=2, upper=50, classifier=os.environ.get("HYSORTK_CLASSIFIER", "heavy_hitter"))
    base_rate = None
    for n_dev in sweep:
        mesh = make_mesh(all_devs[:n_dev])
        rng = np.random.default_rng(0)
        # Weak scaling: constant work PER shard.
        per = args.bases_per_shard
        n_reads = per // args.read_len
        blocks_c, blocks_v = [], []
        for s in range(n_dev):
            reads = rng.integers(
                0, 4, size=(n_reads, args.read_len), dtype=np.int8
            )
            c, v = fasta_io.flatten_for_device(
                reads.reshape(-1),
                np.full(n_reads, args.read_len, dtype=np.int64),
                cfg.k,
                cfg.pad_multiple,
            )
            blocks_c.append(c)
            blocks_v.append(v)
        block = max(b.shape[0] for b in blocks_c)
        codes = np.zeros((n_dev, block), np.int8)
        valid = np.zeros((n_dev, block), bool)
        for s in range(n_dev):
            codes[s, : blocks_c[s].shape[0]] = blocks_c[s]
            valid[s, : blocks_v[s].shape[0]] = blocks_v[s]
        codes, valid = codes.reshape(-1), valid.reshape(-1)
        total_kmers = int(valid.sum())

        count_flat_sharded(codes, valid, cfg, mesh)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            count_flat_sharded(codes, valid, cfg, mesh)
            best = min(best, time.perf_counter() - t0)
        rate = total_kmers / best
        per_shard = rate / n_dev
        if base_rate is None:
            base_rate = per_shard
        print(
            json.dumps(
                {
                    "devices": n_dev,
                    "kmers_per_sec": round(rate),
                    "kmers_per_sec_per_shard": round(per_shard),
                    "weak_scaling_efficiency": round(per_shard / base_rate, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
