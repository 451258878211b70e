"""End-to-end single-chip pipeline vs the brute-force oracle."""

import numpy as np
import pytest

from hysortk_tpu import KmerConfig, count_reads
from hysortk_tpu.io import fasta as fasta_io
from hysortk_tpu import testing as oracle


def _run(reads, cfg):
    codes, lengths = fasta_io.reads_to_codes(reads)
    kmerlist, hist = count_reads(codes, lengths, cfg)
    return kmerlist.as_dict(), hist


def _expect(reads, cfg):
    filt = oracle.oracle_filtered(reads, cfg.k, cfg.lower, cfg.upper)
    return {k.encode(): v for k, v in filt.items()}


@pytest.mark.parametrize("k", [15, 31, 55, 96])
def test_random_reads_match_oracle(k):
    rng = np.random.default_rng(42)
    # Small alphabet region sizes force repeated k-mers.
    reads = oracle.random_reads(rng, 60, k, 3 * k)
    # Duplicate some reads to get counts above 1.
    reads = reads + reads[:20] + reads[:10]
    cfg = KmerConfig(k=k, m=min(17, k - 1), lower=2, upper=50)
    got, hist = _run(reads, cfg)
    want = _expect(reads, cfg)
    assert got == want
    # Histogram equality.
    want_hist = oracle.oracle_histogram(
        oracle.oracle_filtered(reads, cfg.k, cfg.lower, cfg.upper)
    )
    got_hist = {c: int(n) for c, n in enumerate(hist) if n > 0}
    assert got_hist == want_hist


def test_lower_upper_filter_boundaries():
    # 3 copies of one read: all its unique kmers have count 3 (or multiples).
    read = "ACGTTTACGGGACGTAACGTACCACGTTGCA"
    reads = [read] * 3
    cfg = KmerConfig(k=15, m=7, lower=3, upper=3)
    got, _ = _run(reads, cfg)
    want = _expect(reads, cfg)
    assert got == want
    assert len(got) > 0
    cfg2 = KmerConfig(k=15, m=7, lower=4, upper=10)
    got2, _ = _run(reads, cfg2)
    assert got2 == _expect(reads, cfg2)


def test_n_bases_read_as_a():
    reads = ["ACGNNACGTTACGTACGTT" * 2]
    cfg = KmerConfig(k=15, m=7, lower=1, upper=1000)
    got, _ = _run(reads, cfg)
    assert got == _expect(reads, cfg)


def test_reads_shorter_than_k_are_skipped():
    reads = ["ACGT", "ACGTACGTACGTACGTACG", "AC"]
    cfg = KmerConfig(k=15, m=7, lower=1, upper=100)
    got, _ = _run(reads, cfg)
    assert got == _expect(reads, cfg)


def test_kmers_never_cross_read_boundaries():
    # Two reads whose concatenation would create phantom kmers.
    reads = ["ACGTACGTACGTACGT", "TTTTGGGGCCCCAAAA"]
    cfg = KmerConfig(k=16, m=7, lower=1, upper=100)
    got, _ = _run(reads, cfg)
    assert got == _expect(reads, cfg)


def test_empty_input():
    cfg = KmerConfig(k=15, m=7, lower=1, upper=100)
    got, hist = _run([], cfg)
    assert got == {}
    assert int(np.sum(hist)) == 0


def test_reference_default_config():
    # Reference defaults: K=31 M=17 L=15 U=40 (Makefile:1-46).
    rng = np.random.default_rng(3)
    base = oracle.random_reads(rng, 8, 40, 80)
    reads = base * 20  # counts ~20 land inside [15, 40]
    cfg = KmerConfig()  # defaults mirror the reference
    got, _ = _run(reads, cfg)
    assert got == _expect(reads, cfg)
    assert len(got) > 0
