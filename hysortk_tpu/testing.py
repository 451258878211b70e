"""Brute-force oracles for tests (pure Python/numpy, no JAX).

Defines the ground-truth semantics the device pipeline must reproduce:
canonical k-mer = lexicographic min(seq, revcomp(seq)) with A<C<G<T and
N (or any non-ACGT char) read as A — exactly the reference's behavior
(include/kmer.hpp GetRep + include/dnaseq.hpp codetab).
"""

from __future__ import annotations

from collections import Counter
from typing import Sequence

_COMP = str.maketrans("ACGT", "TGCA")
_CLEAN = {c: "A" for c in "NnRYSWKMBDHVryswkmbdhv"}


def normalize(read: str) -> str:
    """Uppercase and map non-ACGT to A (reference dnaseq.hpp codetab)."""
    s = read.upper()
    return "".join(ch if ch in "ACGT" else "A" for ch in s)


def revcomp(s: str) -> str:
    return s.translate(_COMP)[::-1]


def canonical(s: str) -> str:
    rc = revcomp(s)
    return s if s <= rc else rc


def oracle_counts(reads: Sequence[str], k: int) -> Counter:
    """Unfiltered canonical k-mer counts."""
    counts: Counter = Counter()
    for read in reads:
        s = normalize(read)
        for i in range(len(s) - k + 1):
            counts[canonical(s[i : i + k])] += 1
    return counts


def oracle_filtered(
    reads: Sequence[str], k: int, lower: int, upper: int
) -> dict[str, int]:
    """[L, U]-filtered counts: the reference's final KmerList content."""
    return {
        kmer: c
        for kmer, c in oracle_counts(reads, k).items()
        if lower <= c <= upper
    }


def oracle_histogram(filtered: dict[str, int]) -> dict[int, int]:
    """count -> number of kmers with that count (print_kmer_histogram)."""
    hist: Counter = Counter(filtered.values())
    return dict(hist)


def random_reads(
    rng, n_reads: int, min_len: int, max_len: int, alphabet: str = "ACGT"
) -> list[str]:
    lens = rng.integers(min_len, max_len + 1, size=n_reads)
    return [
        "".join(rng.choice(list(alphabet), size=l)) for l in lens
    ]


def oracle_minimizer_dests(
    read: str, k: int, m: int, num_buckets: int, hash_fn
) -> list[int]:
    """Per-k-mer destination via explicit window scan (oracle for ops/minimizer)."""
    s = normalize(read)
    mhash = [hash_fn(canonical(s[i : i + m])) for i in range(len(s) - m + 1)]
    dests = []
    for i in range(len(s) - k + 1):
        dests.append(min(mhash[i : i + k - m + 1]) % num_buckets)
    return dests


def oracle_occurrences(reads: Sequence[str], k: int) -> dict[str, set]:
    """canonical kmer -> {(read_id, pos), ...} over all occurrences —
    the EXTENSION-mode payload oracle (reference src/kmerops.cpp:1430-1438)."""
    occ: dict[str, set] = {}
    for rid, read in enumerate(reads):
        r = normalize(read)
        for i in range(len(r) - k + 1):
            occ.setdefault(canonical(r[i : i + k]), set()).add((rid, i))
    return occ
