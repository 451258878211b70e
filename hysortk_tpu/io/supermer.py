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
    n = codes.shape[0]
    valid = valid.astype(bool)
    idx = np.flatnonzero(valid)
    if idx.size == 0:
        empty = [
            SupermerBatch(
                np.zeros(0, np.uint32), np.zeros(0, np.uint8)
            )
            for _ in range(num_buckets)
        ]
        return empty

    d = dest[idx].astype(np.int64)
    # A new run starts when: first valid kmer, non-adjacent flat position
    # (read boundary / gap), destination change, or run-length cap.
    gap = np.empty(idx.size, dtype=bool)
    gap[0] = True
    gap[1:] = (idx[1:] != idx[:-1] + 1) | (d[1:] != d[:-1])
    # Apply the 250-base cap within runs: a run of R kmers spans R+k-1 bases.
    max_kmers = MAX_SUPERMER_LEN - k + 1
    run_id = np.cumsum(gap) - 1
    pos_in_run = np.arange(idx.size) - np.maximum.accumulate(
        np.where(gap, np.arange(idx.size), 0)
    )
    gap = gap | (pos_in_run % max_kmers == 0) & (pos_in_run > 0)
    run_id = np.cumsum(gap) - 1

    starts = np.flatnonzero(gap)
    run_kmers = np.diff(np.concatenate([starts, [idx.size]]))
    run_start_flat = idx[starts]
    run_dest = d[starts]
    run_bases = run_kmers + k - 1

    batches = []
    for b in range(num_buckets):
        sel = np.flatnonzero(run_dest == b)
        lengths = run_bases[sel].astype(np.uint32)
        nbytes = (lengths.astype(np.int64) + 3) // 4
        total = int(nbytes.sum())
        payload = np.zeros(total, dtype=np.uint8)
        # Gather each supermer's bases and pack 4/byte.
        out_off = np.concatenate([[0], np.cumsum(nbytes)[:-1]])
        for s_i, (fs, lb, oo) in enumerate(
            zip(run_start_flat[sel], lengths, out_off)
        ):
            seq = codes[fs : fs + lb].astype(np.uint8)
            pad = (-int(lb)) % 4  # int(): negating a numpy uint32 overflows
            if pad:
                seq = np.concatenate([seq, np.zeros(pad, np.uint8)])
            quads = seq.reshape(-1, 4)
            packed = (
                (quads[:, 0] << 6) | (quads[:, 1] << 4)
                | (quads[:, 2] << 2) | quads[:, 3]
            )
            payload[oo : oo + packed.size] = packed
        batches.append(SupermerBatch(lengths, payload))
    return batches


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

    total_bases = int(lengths.sum())
    codes = np.empty(total_bases, dtype=np.uint8)
    valid = np.zeros(total_bases, dtype=bool)
    out = 0
    # Unpack all payload bytes to 4 codes at once, then slice per supermer.
    b = batch.payload
    all4 = np.stack(
        [(b >> 6) & 3, (b >> 4) & 3, (b >> 2) & 3, b & 3], axis=1
    ).reshape(-1)
    for lb, bo in zip(lengths, byte_off):
        codes[out : out + lb] = all4[bo * 4 : bo * 4 + lb]
        valid[out : out + lb - k + 1] = True
        out += lb
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
