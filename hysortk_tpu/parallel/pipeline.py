"""Sharded (multi-device / multi-host) k-mer counting pipeline.

SPMD redesign of the reference's rank pipeline (src/kmerops.cpp): one
shard_map program per device batch does

  local canonical keys -> destination hash -> pack -> all_to_all
  -> local sort -> run-length count -> [L,U] filter -> psum histogram

Ownership rule: dest = mix(key) % num_shards. The reference routes by
*minimizer* hash (so co-destined k-mers form supermers that compress the
MPI wire, src/kmerops.cpp:1044-1047); on ICI we exchange packed keys
directly, so hashing the whole key gives strictly better balance with the
same correctness guarantee (equal keys land together). The minimizer
machinery (ops/minimizer.py) remains in use for the host-side supermer wire
format (io/supermer.py) used when reads are shipped across DCN.

With cfg.combiner=True each shard pre-aggregates its local duplicates
(sort + run-length) and exchanges (key, partial_count) pairs — the always-on
generalization of the reference's heavy-hitter ScatteredKmerList path
(src/kmerops.cpp:363-417).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import KmerConfig
from ..ops import count as count_ops
from ..ops import hashes
from ..ops import kmer as kmer_ops
from ..ops import sort as sort_ops
from ..pipeline import KmerList
from . import exchange
from .mesh import SHARD_AXIS, make_mesh


def _shard_body(
    codes, valid, assign, *, cfg: KmerConfig, num_shards: int, capacity: int
):
    """Per-shard computation (runs under shard_map; axis SHARD_AXIS).

    assign: (num_buckets,) int32 bucket->shard table (minimizer routing), or
    a length-1 dummy for kmer_hash routing.
    """
    codes = codes.astype(jnp.int32)
    words = kmer_ops.canonical_words(codes, cfg.k)
    invalid = (~valid).astype(jnp.uint32)

    if cfg.routing == "minimizer":
        from ..ops import minimizer as minimizer_ops

        num_buckets = num_shards * cfg.avg_buckets_per_shard
        bucket = minimizer_ops.kmer_destinations(
            codes, cfg.k, cfg.m, num_buckets
        )
        dest = assign[bucket].astype(jnp.uint32)
    else:
        bucket = None
        dest = hashes.mix_words(words) % jnp.uint32(num_shards)

    if cfg.combiner:
        # Local pre-aggregation: one entry per distinct local key. With
        # minimizer routing the bucket id rides as the leading sort word
        # (equal keys share their minimizer, so (bucket, key) runs == key
        # runs) because the minimizer is positional and would be lost after
        # the sort.
        if cfg.routing == "minimizer":
            sort_words_in = [bucket.astype(jnp.uint32), *words]
        else:
            sort_words_in = list(words)
        inv_s, words_s_all, _ = sort_ops.sort_keys(
            invalid, sort_words_in, backend=cfg.sort_backend
        )
        svalid = inv_s == 0
        head, local_cnt = count_ops.run_length_count(svalid, words_s_all)
        entry_invalid = (~head).astype(jnp.uint32)
        if cfg.routing == "minimizer":
            words_s = words_s_all[1:]
            entry_dest = assign[words_s_all[0].astype(jnp.int32)].astype(
                jnp.uint32
            )
        else:
            words_s = words_s_all
            entry_dest = hashes.mix_words(words_s) % jnp.uint32(num_shards)
        send_w, send_p, counts, overflow = exchange.pack_by_destination(
            entry_invalid, entry_dest, words_s, [local_cnt.astype(jnp.uint32)],
            num_shards, capacity,
        )
    else:
        send_w, send_p, counts, overflow = exchange.pack_by_destination(
            invalid, dest, words, [], num_shards, capacity
        )

    recv_w, recv_p, _, recv_valid = exchange.all_to_all_exchange(
        send_w, send_p, counts, SHARD_AXIS
    )

    flat_w = [w.reshape(-1) for w in recv_w]
    flat_valid = recv_valid.reshape(-1)
    flat_invalid = (~flat_valid).astype(jnp.uint32)

    if cfg.combiner:
        weights = recv_p[0].reshape(-1)
        inv_s, words_s, payloads_s = sort_ops.sort_keys(
            flat_invalid, flat_w, payloads=[weights], backend=cfg.sort_backend
        )
        weights_s = payloads_s[0].astype(jnp.int32)
        svalid = inv_s == 0
        head, cnt = count_ops.run_length_sum(svalid, words_s, weights_s)
    else:
        inv_s, words_s, _ = sort_ops.sort_keys(
            flat_invalid, flat_w, backend=cfg.sort_backend
        )
        svalid = inv_s == 0
        head, cnt = count_ops.run_length_count(svalid, words_s)

    keep = count_ops.frequency_filter(head, cnt, cfg.lower, cfg.upper)
    overflow = jax.lax.pmax(overflow.astype(jnp.int32), SHARD_AXIS)

    # Words returned separately (stacking on device wastes an HBM pass).
    # The histogram is computed host-side from the compacted counts (like the
    # single-chip path; the reference's count timer also excludes histogram
    # work) — a device histogram at upper=65535 would need an (N, 65536)
    # reduction or a scatter, both hostile to the TPU.
    return tuple(words_s), cnt, keep, overflow


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_shards", "capacity", "mesh")
)
def _count_sharded_jit(codes, valid, assign, *, cfg, num_shards, capacity, mesh):
    body = functools.partial(
        _shard_body, cfg=cfg, num_shards=num_shards, capacity=capacity
    )
    word_specs = tuple(P(SHARD_AXIS) for _ in range(cfg.words))
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P()),
        out_specs=(word_specs, P(SHARD_AXIS), P(SHARD_AXIS), P()),
        check_rep=False,
    )(codes, valid, assign)


@functools.partial(jax.jit, static_argnames=("cfg", "num_shards", "mesh"))
def _bucket_sizes_jit(codes, valid, *, cfg, num_shards, mesh):
    """Global per-bucket k-mer counts (the classifier/dispatcher input —
    reference Reduce of task sizes, src/kmerops.cpp:1157-1199)."""
    from ..ops import minimizer as minimizer_ops
    from . import dispatch

    num_buckets = num_shards * cfg.avg_buckets_per_shard

    def body(codes, valid):
        bucket = minimizer_ops.kmer_destinations(
            codes.astype(jnp.int32), cfg.k, cfg.m, num_buckets
        )
        sizes = dispatch.bucket_sizes_device(bucket, valid, num_buckets)
        return jax.lax.psum(sizes, SHARD_AXIS)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=P(),
        check_rep=False,
    )(codes, valid)


def count_flat_sharded(
    codes: np.ndarray,
    valid: np.ndarray,
    cfg: KmerConfig,
    mesh: Optional[Mesh] = None,
) -> tuple[KmerList, np.ndarray]:
    """Sharded pipeline entry: flat global (codes, valid) -> (KmerList, hist).

    `codes`/`valid` global length must be divisible by the shard count (the
    host loaders pad per shard). Retries with doubled exchange capacity on
    overflow (the rare, pathological-skew case).
    """
    mesh = mesh or make_mesh()
    num_shards = mesh.devices.size
    n = codes.shape[0]
    assert n % num_shards == 0, (n, num_shards)
    n_local = n // num_shards

    codes_j = jnp.asarray(codes, dtype=jnp.int8)
    valid_j = jnp.asarray(valid)

    if cfg.routing == "minimizer":
        from . import dispatch

        sizes = np.asarray(
            _bucket_sizes_jit(
                codes_j, valid_j, cfg=cfg, num_shards=num_shards, mesh=mesh
            )
        )
        assign = jnp.asarray(
            dispatch.balanced_assignment(sizes, num_shards)
        )
    else:
        assign = jnp.zeros(1, dtype=jnp.int32)

    capacity = max(int(n_local / num_shards * cfg.capacity_factor), 64)
    for _attempt in range(4):
        keys, cnt, keep, overflow = _count_sharded_jit(
            codes_j, valid_j, assign,
            cfg=cfg, num_shards=num_shards, capacity=capacity, mesh=mesh,
        )
        if int(jax.device_get(overflow)) == 0:
            break
        capacity *= 2
    else:
        raise RuntimeError("exchange capacity overflow after 4 doublings")

    from ..pipeline import compact_keys, host_histogram

    keep_np = np.asarray(keep)
    kmerlist = KmerList(
        keys=compact_keys(keys, keep_np),
        counts=np.asarray(cnt)[keep_np],
        k=cfg.k,
    )
    return kmerlist, host_histogram(kmerlist.counts, cfg.upper)


def partition_read_indices(
    lengths: np.ndarray, num_shards: int
) -> list[list[int]]:
    """Greedy contiguous split of read indices balancing total bases —
    the in-memory analogue of the reference's getpartition
    (fastaindex.cpp:52-100)."""
    per_shard: list[list[int]] = [[] for _ in range(num_shards)]
    total = int(lengths.sum())
    target = total / num_shards if num_shards else 0
    shard, acc = 0, 0
    for i, ln in enumerate(lengths):
        if shard < num_shards - 1 and acc > 0 and acc + ln / 2 > target:
            shard += 1
            acc = 0
        per_shard[shard].append(i)
        acc += int(ln)
    return per_shard


def distribute_reads(
    codes: np.ndarray,
    lengths: np.ndarray,
    cfg: KmerConfig,
    num_shards: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side analogue of the reference's read partitioning: split reads
    into `num_shards` base-balanced groups (fastaindex.cpp:52-100) and build
    one equal-size flat (codes, valid) block per shard, concatenated."""
    from ..io import fasta as fasta_io

    offsets = np.concatenate([[0], np.cumsum(lengths)])
    per_shard = partition_read_indices(lengths, num_shards)

    blocks = []
    for part in per_shard:
        if part:
            c = np.concatenate(
                [codes[offsets[i] : offsets[i + 1]] for i in part]
            )
            l = lengths[np.asarray(part, dtype=np.int64)]
        else:
            c = np.zeros(0, dtype=codes.dtype)
            l = np.zeros(0, dtype=np.int64)
        blocks.append(
            fasta_io.flatten_for_device(c, l, cfg.k, cfg.pad_multiple)
        )
    block_len = max(b[0].shape[0] for b in blocks)
    out_codes = np.zeros((num_shards, block_len), dtype=np.int8)
    out_valid = np.zeros((num_shards, block_len), dtype=bool)
    for s, (c, v) in enumerate(blocks):
        out_codes[s, : c.shape[0]] = c
        out_valid[s, : v.shape[0]] = v
    return out_codes.reshape(-1), out_valid.reshape(-1)


def count_reads_sharded(
    codes: np.ndarray,
    lengths: np.ndarray,
    cfg: KmerConfig,
    mesh: Optional[Mesh] = None,
) -> tuple[KmerList, np.ndarray]:
    mesh = mesh or make_mesh()
    flat_codes, flat_valid = distribute_reads(
        codes, lengths, cfg, mesh.devices.size
    )
    return count_flat_sharded(flat_codes, flat_valid, cfg, mesh)


# ---------------------------------------------------------------------------
# Extension (EXT=1) sharded pipeline: (ReadId, PosInRead) through the
# exchange — the reference's EXTENSION length_t wire format
# (include/kmer.hpp:346-360). The heavy-hitter/combiner path is unavailable
# in EXT mode, same restriction as the reference (src/kmerops.cpp:109-113).
# ---------------------------------------------------------------------------


def _shard_body_ext(
    codes, valid, rid, pos, *, cfg: KmerConfig, num_shards: int, capacity: int
):
    codes = codes.astype(jnp.int32)
    words = kmer_ops.canonical_words(codes, cfg.k)
    invalid = (~valid).astype(jnp.uint32)
    dest = hashes.mix_words(words) % jnp.uint32(num_shards)

    send_w, send_p, counts, overflow = exchange.pack_by_destination(
        invalid, dest, words,
        [rid.astype(jnp.uint32), pos.astype(jnp.uint32)],
        num_shards, capacity,
    )
    recv_w, recv_p, _, recv_valid = exchange.all_to_all_exchange(
        send_w, send_p, counts, SHARD_AXIS
    )

    flat_w = [w.reshape(-1) for w in recv_w]
    flat_p = [p.reshape(-1) for p in recv_p]
    flat_invalid = (~recv_valid.reshape(-1)).astype(jnp.uint32)

    inv_s, words_s, payloads_s = sort_ops.sort_keys(
        flat_invalid, flat_w, payloads=flat_p, backend=cfg.sort_backend
    )
    svalid = inv_s == 0
    head, cnt = count_ops.run_length_count(svalid, words_s)
    keep = count_ops.frequency_filter(head, cnt, cfg.lower, cfg.upper)
    overflow = jax.lax.pmax(overflow.astype(jnp.int32), SHARD_AXIS)
    return tuple(words_s), cnt, keep, payloads_s[0], payloads_s[1], overflow


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_shards", "capacity", "mesh")
)
def _count_sharded_ext_jit(
    codes, valid, rid, pos, *, cfg, num_shards, capacity, mesh
):
    body = functools.partial(
        _shard_body_ext, cfg=cfg, num_shards=num_shards, capacity=capacity
    )
    word_specs = tuple(P(SHARD_AXIS) for _ in range(cfg.words))
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS),) * 4,
        out_specs=(word_specs,) + (P(SHARD_AXIS),) * 4 + (P(),),
        check_rep=False,
    )(codes, valid, rid, pos)


def build_ext_blocks(
    codes: np.ndarray,
    lengths: np.ndarray,
    cfg: KmerConfig,
    num_shards: int,
    read_id_offset: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Per-shard equal-size (codes, valid, rid, pos) blocks for EXT mode."""
    from ..io import fasta as fasta_io

    offsets = np.concatenate([[0], np.cumsum(lengths)])
    per_shard = partition_read_indices(lengths, num_shards)

    blocks = []
    for part in per_shard:
        if part:
            c = np.concatenate(
                [codes[offsets[i] : offsets[i + 1]] for i in part]
            )
            l = lengths[np.asarray(part, dtype=np.int64)]
            base = read_id_offset + part[0]
        else:
            c = np.zeros(0, dtype=codes.dtype)
            l = np.zeros(0, dtype=np.int64)
            base = read_id_offset
        blocks.append(
            fasta_io.flatten_for_device_ext(
                c, l, cfg.k, cfg.pad_multiple, base
            )
        )
    block_len = max(b[0].shape[0] for b in blocks)
    sc = np.zeros((num_shards, block_len), dtype=np.int8)
    sv = np.zeros((num_shards, block_len), dtype=bool)
    sr = np.zeros((num_shards, block_len), dtype=np.int32)
    sp = np.zeros((num_shards, block_len), dtype=np.uint32)
    for s, (c, v, r, p) in enumerate(blocks):
        sc[s, : c.shape[0]] = c
        sv[s, : v.shape[0]] = v
        sr[s, : r.shape[0]] = r
        sp[s, : p.shape[0]] = p
    return sc, sv, sr, sp, block_len


def count_reads_sharded_ext(
    codes: np.ndarray,
    lengths: np.ndarray,
    cfg: KmerConfig,
    mesh: Optional[Mesh] = None,
    read_id_offset: int = 0,
) -> tuple["KmerListExt", np.ndarray]:
    """Sharded EXT pipeline: per-kmer (rid, pos) occurrence lists."""
    from ..pipeline import KmerListExt, host_histogram

    mesh = mesh or make_mesh()
    num_shards = mesh.devices.size

    sc, sv, sr, sp, block_len = build_ext_blocks(
        codes, lengths, cfg, num_shards, read_id_offset
    )
    n_local = block_len
    capacity = max(int(n_local / num_shards * cfg.capacity_factor), 64)
    for _attempt in range(4):
        keys, cnt, keep, srid, spos, overflow = _count_sharded_ext_jit(
            jnp.asarray(sc.reshape(-1)),
            jnp.asarray(sv.reshape(-1)),
            jnp.asarray(sr.reshape(-1)),
            jnp.asarray(sp.reshape(-1)),
            cfg=cfg, num_shards=num_shards, capacity=capacity, mesh=mesh,
        )
        if int(jax.device_get(overflow)) == 0:
            break
        capacity *= 2
    else:
        raise RuntimeError("exchange capacity overflow after 4 doublings")

    keep_np = np.asarray(keep)
    cnt_np = np.asarray(cnt)
    srid_np = np.asarray(srid).astype(np.int32)
    spos_np = np.asarray(spos).astype(np.uint32)
    starts = np.flatnonzero(keep_np)
    counts = cnt_np[starts]
    from ..pipeline import compact_keys

    result = KmerListExt(
        keys=compact_keys(keys, keep_np),
        counts=counts,
        k=cfg.k,
        pos=[spos_np[s : s + c] for s, c in zip(starts, counts)],
        rid=[srid_np[s : s + c] for s, c in zip(starts, counts)],
    )
    return result, host_histogram(result.counts, cfg.upper)
