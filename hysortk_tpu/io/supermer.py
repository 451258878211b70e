"""Supermer wire format: minimizer-run compression of the k-mer stream.

Host-side analogue of the reference's SupermerEncoder + 2-bit repacking
(reference: src/kmerops.cpp:1096-1148, include/supermer.hpp). A supermer is a
maximal run of consecutive k-mers (within one read) sharing a destination
bucket; shipping the run's L bases instead of its L-k+1 separate keys
compresses the wire by ~(k-m)/2x. The reference uses this format on every MPI
byte; the TPU build exchanges packed keys directly over ICI (bandwidth is
cheap there) and reserves supermers for the *host-to-host DCN hop* when a
reader process feeds remote shards, and for spill-to-disk.

Encoding is fully vectorized numpy: run boundaries are computed with mask
arithmetic (destination change / read boundary / 250-base cap,
MAX_SUPERMER_LEN at reference supermer.hpp:20), payload packing with
bit-shift reductions — no per-base Python loops.
"""

from __future__ import annotations

import dataclasses

import numpy as np

MAX_SUPERMER_LEN = 250  # bases; reference include/supermer.hpp:20


@dataclasses.dataclass
class SupermerBatch:
    """One destination bucket's supermers, wire-ready.

    lengths: (S,) uint32 — supermer lengths in bases (each >= k)
    payload: (sum ceil(len/4),) uint8 — per-supermer 2-bit packed bases,
             4 bases/byte, big-endian within the byte (base j at shift
             6-2*(j%4)), each supermer starting on a fresh byte — the
             reference's exact packing (dnaseq.hpp:33-172).
    """

    lengths: np.ndarray
    payload: np.ndarray

    def num_kmers(self, k: int) -> int:
        if self.lengths.size == 0:
            return 0
        return int((self.lengths.astype(np.int64) - k + 1).sum())

    def nbytes(self) -> int:
        return int(self.lengths.nbytes + self.payload.nbytes)


def run_boundaries(
    valid: np.ndarray, dest: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Supermer run decomposition of the flat k-mer stream.

    A run is a maximal stretch of consecutive valid k-mers sharing a
    destination, capped at MAX_SUPERMER_LEN bases (the reference's
    SupermerEncoder boundary rule, src/kmerops.cpp:1096-1148). Returns
    (run_start_flat, run_bases, run_dest); dest is only read where valid.
    """
    max_kmers = MAX_SUPERMER_LEN - k + 1
    from . import native

    if native.available():
        nat = native.run_boundaries(valid, dest, max_kmers)
        if nat is not None:
            starts_n, kmers_n, dest_n = nat
            return starts_n, kmers_n + k - 1, dest_n.astype(np.int64)

    valid = valid.astype(bool)
    idx = np.flatnonzero(valid)
    empty = np.zeros(0, np.int64)
    if idx.size == 0:
        return empty, empty, empty

    d = dest[idx].astype(np.int64)
    # A new run starts when: first valid kmer, non-adjacent flat position
    # (read boundary / gap), destination change, or run-length cap.
    gap = np.empty(idx.size, dtype=bool)
    gap[0] = True
    gap[1:] = (idx[1:] != idx[:-1] + 1) | (d[1:] != d[:-1])
    # Apply the 250-base cap within runs: a run of R kmers spans R+k-1 bases.
    max_kmers = MAX_SUPERMER_LEN - k + 1
    pos_in_run = np.arange(idx.size) - np.maximum.accumulate(
        np.where(gap, np.arange(idx.size), 0)
    )
    gap = gap | (pos_in_run % max_kmers == 0) & (pos_in_run > 0)

    starts = np.flatnonzero(gap)
    run_kmers = np.diff(np.concatenate([starts, [idx.size]]))
    run_start_flat = idx[starts]
    run_dest = d[starts]
    run_bases = run_kmers + k - 1
    return run_start_flat, run_bases, run_dest


def encode_supermers(
    codes: np.ndarray,
    valid: np.ndarray,
    dest: np.ndarray,
    k: int,
    num_buckets: int,
) -> list[SupermerBatch]:
    """Split the flat stream into per-destination supermers.

    codes/valid/dest are the flat arrays (dest only meaningful where valid).
    Returns one SupermerBatch per destination bucket.
    """
    run_start_flat, run_bases, run_dest = run_boundaries(valid, dest, k)
    if run_start_flat.size == 0:
        return [
            SupermerBatch(np.zeros(0, np.uint32), np.zeros(0, np.uint8))
            for _ in range(num_buckets)
        ]

    batches = []
    for b in range(num_buckets):
        sel = np.flatnonzero(run_dest == b)
        batches.append(
            _pack_runs(codes, run_start_flat[sel], run_bases[sel])
        )
    return batches


def encode_supermer_streams(
    codes: np.ndarray,
    valid: np.ndarray,
    dest: np.ndarray,
    k: int,
    num_buckets: int,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Per-destination supermer run streams for the device wire.

    Same run decomposition as encode_supermers, but each bucket's payload
    stays as the flat concatenation of its supermers' base codes (the 2-bit
    packing happens once at the wire, pack_codes_2bit) split by a lengths
    array — the shape ops/wire.decode_block consumes, where every supermer
    plays the role of a short read. Returns [(codes int8, lengths uint32)]
    per bucket. Wire density = lengths bytes + bases/4, the reference's
    supermer exchange format (src/kmerops.cpp:1096-1148).
    """
    run_start_flat, run_bases, run_dest = run_boundaries(valid, dest, k)
    out = []
    for b in range(num_buckets):
        sel = np.flatnonzero(run_dest == b)
        st = run_start_flat[sel]
        ln = run_bases[sel]
        out.append((_gather_stream(codes, st, ln), ln.astype(np.uint32)))
    return out


def _gather_stream(
    codes: np.ndarray, starts: np.ndarray, bases: np.ndarray
) -> np.ndarray:
    """Concatenate codes[start : start+bases) per run (native memcpy path,
    vectorized-index numpy fallback)."""
    total = int(bases.sum())
    if total == 0:
        return np.zeros(0, np.int8)
    off = np.concatenate([[0], np.cumsum(bases.astype(np.int64))[:-1]])
    from . import native

    if native.available():
        g = native.gather_runs(
            codes.astype(np.int8, copy=False), starts.astype(np.int64),
            bases.astype(np.int64), off, total,
        )
        if g is not None:
            return g
    sup = np.repeat(np.arange(bases.size, dtype=np.int64), bases)
    idx = starts.astype(np.int64)[sup] + (
        np.arange(total, dtype=np.int64) - off[sup]
    )
    return codes[idx].astype(np.int8)


def _pack_runs(
    codes: np.ndarray, starts: np.ndarray, lengths: np.ndarray
) -> SupermerBatch:
    """Pack runs codes[starts[s] : starts[s]+lengths[s]] 4 bases/byte,
    each run starting on a fresh byte. Fully vectorized (one flat gather
    per byte lane — no per-run Python loop)."""
    lengths = lengths.astype(np.uint32)
    if lengths.size == 0:
        return SupermerBatch(lengths, np.zeros(0, np.uint8))
    nbytes = (lengths.astype(np.int64) + 3) // 4
    out_off = np.concatenate([[0], np.cumsum(nbytes)[:-1]])
    total = int(nbytes.sum())
    sup = np.repeat(np.arange(lengths.size, dtype=np.int64), nbytes)
    byte_in_sup = np.arange(total, dtype=np.int64) - out_off[sup]
    base0 = starts.astype(np.int64)[sup] + byte_in_sup * 4
    lb = lengths.astype(np.int64)[sup]
    vals = np.zeros(total, dtype=np.uint8)
    limit = max(int(codes.size) - 1, 0)
    for j in range(4):
        in_range = byte_in_sup * 4 + j < lb
        idx = np.minimum(base0 + j, limit)
        v = np.where(in_range, codes[idx].astype(np.uint8), 0)
        vals = (vals << 2) | v
    return SupermerBatch(lengths, vals)


def pack_codes_2bit(codes: np.ndarray) -> np.ndarray:
    """Flat base codes -> uint32 wire words, 16 bases/word big-endian.

    The host side of the device decode in ops/wire.py: word w holds bases
    16w..16w+15, base b at shift 30 - 2*(b%16). ~2 bits/base on the wire
    (vs 8 for int8 codes), matching the reference's 2-bit supermer payload
    density (src/kmerops.cpp:1096-1148)."""
    n = int(codes.size)
    pad = -n % 16
    from . import native

    if pad == 0 and native.available():
        out = native.pack_2bit(codes.astype(np.uint8, copy=False))
        if out is not None:
            return out
    c = np.zeros(n + pad, dtype=np.uint32)
    c[:n] = codes.astype(np.uint32)
    c = c.reshape(-1, 16)
    out = np.zeros(c.shape[0], dtype=np.uint32)
    for j in range(16):
        out |= c[:, j] << np.uint32(30 - 2 * j)
    return out


def decode_supermers(
    batch: SupermerBatch, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """SupermerBatch -> flat (codes, valid) ready for the device pipeline.

    Each supermer is decoded back to its base codes; every window of k bases
    inside one supermer is a valid k-mer (the receive-side parse the reference
    does in GatheredSupermer::receive_from_buffer_stage2,
    src/kmerops.cpp:484-521).
    """
    if batch.lengths.size == 0:
        return np.zeros(0, np.uint8), np.zeros(0, bool)
    lengths = batch.lengths.astype(np.int64)
    nbytes = (lengths + 3) // 4
    byte_off = np.concatenate([[0], np.cumsum(nbytes)[:-1]])
    base_off = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    total_bases = int(lengths.sum())

    # Unpack all payload bytes to 4 codes at once, then one vectorized
    # gather maps each output base to its (supermer, offset) source.
    b = batch.payload
    all4 = np.stack(
        [(b >> 6) & 3, (b >> 4) & 3, (b >> 2) & 3, b & 3], axis=1
    ).reshape(-1)
    sup = np.repeat(np.arange(lengths.size, dtype=np.int64), lengths)
    base_in_sup = np.arange(total_bases, dtype=np.int64) - base_off[sup]
    codes = all4[byte_off[sup] * 4 + base_in_sup].astype(np.uint8)
    valid = base_in_sup <= lengths[sup] - k
    return codes, valid


def supermer_stats(batches: list[SupermerBatch], k: int, words: int) -> dict:
    """Wire-size accounting: supermer bytes vs raw packed-key bytes."""
    total_kmers = sum(b.num_kmers(k) for b in batches)
    wire = sum(b.nbytes() for b in batches)
    raw = total_kmers * words * 4
    return {
        "supermers": int(sum(b.lengths.size for b in batches)),
        "kmers": int(total_kmers),
        "wire_bytes": int(wire),
        "raw_key_bytes": int(raw),
        "compression": (raw / wire) if wire else float("inf"),
    }


def encode_supermer_streams_ext(
    codes: np.ndarray,
    valid: np.ndarray,
    dest: np.ndarray,
    k: int,
    num_buckets: int,
    read_lengths: np.ndarray,
    read_id_offset: int = 0,
) -> list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """EXT variant of encode_supermer_streams: each bucket also carries
    per-supermer (rid0, pos0) — the read id and in-read position of the
    run's first base, the reference's EXT supermer header
    ({len, pos, rid}, include/kmer.hpp:348-360). +8 B/supermer on the wire
    (~0.5 B/kmer at the mean run length); per-k-mer (rid, pos) derive on
    device (ops/wire.fill_run_meta). Returns
    [(codes int8, lengths uint32, rid0 int32, pos0 uint32)] per bucket.
    """
    run_start_flat, run_bases, run_dest = run_boundaries(valid, dest, k)
    read_starts = np.concatenate(
        [[0], np.cumsum(read_lengths.astype(np.int64))]
    )
    if run_start_flat.size:
        rid_all = (
            np.searchsorted(read_starts, run_start_flat, side="right") - 1
        )
        pos_all = run_start_flat - read_starts[rid_all]
    else:
        rid_all = pos_all = np.zeros(0, np.int64)
    out = []
    for b in range(num_buckets):
        sel = np.flatnonzero(run_dest == b)
        st = run_start_flat[sel]
        ln = run_bases[sel]
        out.append((
            _gather_stream(codes, st, ln),
            ln.astype(np.uint32),
            (rid_all[sel] + read_id_offset).astype(np.int32),
            pos_all[sel].astype(np.uint32),
        ))
    return out
