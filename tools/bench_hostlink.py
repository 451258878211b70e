"""Measure the host<->device link and the streaming batch's host-side
stages in isolation — the data behind e2e wall-time decomposition.

Prints one JSON dict: tunnel H2D/D2H bandwidth at 256 MB, per-stage times
for one 2^26-kmer streaming batch (host pack, H2D, device count, D2H pulls),
and the host merge-prep cost. Run alone (nothing else on the TPU or host).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") or isinstance(out, (list, tuple)) else None
    return time.perf_counter() - t0, out


def main():
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev.device_kind)}), flush=True)
    res = {}

    # Raw link bandwidth, 256 MB each way.
    big = np.random.default_rng(0).integers(
        0, 2**32, size=(64 * 1024 * 1024,), dtype=np.uint32
    )
    dt, dbig = t(lambda: jax.device_put(big, dev))
    res["h2d_256MB_s"] = round(dt, 3)
    res["h2d_MB_per_s"] = round(256 / dt, 1)
    dt, back = t(lambda: jax.device_get(dbig))
    res["d2h_256MB_s"] = round(dt, 3)
    res["d2h_MB_per_s"] = round(256 / dt, 1)
    del dbig, back

    # One streaming batch at production shape (2^26 flat, K=31).
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from hysortk_tpu.config import KmerConfig
    from hysortk_tpu.io import supermer as supermer_io
    from hysortk_tpu.pipeline import _count_device_packed, compact_keys
    from hysortk_tpu.runtime.scheduler import snap_batch_to_pow2_flat

    cfg = KmerConfig(k=31, m=17, lower=2, upper=50, fuse_keybuild=True,
                     fuse_count=True, sort_backend="pallas")
    batch = snap_batch_to_pow2_flat(1 << 26, cfg.pad_multiple)
    read_len = 1024
    n_reads = batch // read_len
    rng = np.random.default_rng(1)
    genome = rng.integers(0, 4, size=batch // 8).astype(np.int8)
    starts = rng.integers(0, genome.size - read_len, size=n_reads)
    codes = genome[(starts[:, None] + np.arange(read_len)[None, :])].reshape(-1)
    lengths = np.full(n_reads, read_len, dtype=np.int32)
    target = -(-(batch + 16) // cfg.pad_multiple) * cfg.pad_multiple

    def pack():
        buf = np.zeros(target, dtype=np.int8)
        buf[: codes.size] = codes
        return supermer_io.pack_codes_2bit(buf)

    dt, packed = t(pack)
    res["host_pack_s"] = round(dt, 3)

    dt, (pj, lj) = t(lambda: (
        jax.device_put(packed, dev), jax.device_put(lengths, dev)
    ))
    res["h2d_batch_s"] = round(dt, 3)
    res["h2d_batch_MB"] = round((packed.nbytes + lengths.nbytes) / 1e6, 1)

    def run():
        return _count_device_packed(
            pj, lj, cfg.k, target, 1, 2**31 - 1, "pallas", True, True
        )

    dt, out = t(run)  # includes compile
    res["device_first_call_s"] = round(dt, 1)
    dt, out = t(run)
    _ = jax.device_get(out[1][:8])
    res["device_steady_s"] = round(dt, 3)

    keys, cnt, keep = out
    dt, keep_np = t(lambda: np.asarray(keep))
    res["d2h_keep_s"] = round(dt, 3)
    dt, compact = t(lambda: compact_keys(keys, keep_np))
    res["d2h_compact_keys_s"] = round(dt, 3)
    dt, cnt_np = t(lambda: np.asarray(cnt)[keep_np])
    res["d2h_cnt_s"] = round(dt, 3)
    res["distinct"] = int(keep_np.sum())
    res["pulled_MB"] = round(
        (keep.nbytes + sum(k.nbytes for k in keys) + cnt.nbytes) / 1e6, 1
    )

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
