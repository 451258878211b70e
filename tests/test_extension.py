"""Extension mode (EXT=1): (ReadId, PosInRead) payloads through sort+count."""

import numpy as np

from hysortk_tpu import KmerConfig
from hysortk_tpu.io import fasta as fasta_io
from hysortk_tpu.pipeline import count_reads_ext
from hysortk_tpu import testing as oracle


def _oracle_ext(reads, k, lower, upper, rid_offset=0):
    """kmer -> (count, {(rid, pos)}) via explicit scan."""
    occ = {}
    for r, read in enumerate(reads):
        s = oracle.normalize(read)
        for i in range(len(s) - k + 1):
            km = oracle.canonical(s[i : i + k])
            occ.setdefault(km, []).append((r + rid_offset, i))
    return {
        km.encode(): (len(v), set(v))
        for km, v in occ.items()
        if lower <= len(v) <= upper
    }


def test_extension_payloads_match_oracle():
    rng = np.random.default_rng(31)
    reads = oracle.random_reads(rng, 25, 35, 70)
    reads = reads + reads[:10]
    cfg = KmerConfig(k=31, m=17, lower=1, upper=50, extension=True,
                     pad_multiple=256)
    codes, lengths = fasta_io.reads_to_codes(reads)
    result, hist = count_reads_ext(codes, lengths, cfg)
    got = result.as_dict()
    want = _oracle_ext(reads, cfg.k, cfg.lower, cfg.upper)
    assert got == want


def test_extension_read_id_offset():
    # The analogue of the reference's MPI_Exscan global read-id base.
    reads = ["ACGTACGTACGTACGTACGA"] * 3
    cfg = KmerConfig(k=15, m=7, lower=1, upper=50, extension=True,
                     pad_multiple=128)
    codes, lengths = fasta_io.reads_to_codes(reads)
    result, _ = count_reads_ext(codes, lengths, cfg, read_id_offset=100)
    got = result.as_dict()
    want = _oracle_ext(reads, cfg.k, cfg.lower, cfg.upper, rid_offset=100)
    assert got == want
    all_rids = {r for _, occ in got.values() for r, _ in occ}
    assert all_rids == {100, 101, 102}


def test_sharded_extension_matches_oracle():
    import jax
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    from hysortk_tpu.parallel.pipeline import count_reads_sharded_ext

    rng = np.random.default_rng(61)
    reads = oracle.random_reads(rng, 30, 35, 70)
    reads = reads + reads[:10]
    cfg = KmerConfig(k=31, m=17, lower=1, upper=50, extension=True,
                     pad_multiple=256)
    codes, lengths = fasta_io.reads_to_codes(reads)
    result, hist = count_reads_sharded_ext(codes, lengths, cfg)
    got = result.as_dict()
    want = _oracle_ext(reads, cfg.k, cfg.lower, cfg.upper)
    assert got == want


def test_split_occurrences_vectorized_and_fast():
    """Per-kmer occurrence assembly is one np.split of views: correct on
    disjoint ascending runs and under 1 s for 1e6 distinct k-mers (the
    per-kmer Python-slice formulation took many seconds at this scale)."""
    import time

    from hysortk_tpu.pipeline import split_occurrences

    rng = np.random.default_rng(3)
    n = 1_000_000
    counts = rng.integers(1, 5, size=n).astype(np.int64)
    gaps = rng.integers(0, 3, size=n).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts + gaps)[:-1]])
    total = int((counts + gaps).sum())
    a = np.arange(total, dtype=np.int64)
    b = a * 7

    # Best of 3: a single measurement is load-sensitive when the suite
    # saturates all host cores (the per-kmer-slice formulation this guards
    # against took >5 s, so the 1 s bound keeps a wide margin).
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ra, rb = split_occurrences(starts, counts, a, b)
        elapsed = min(elapsed, time.perf_counter() - t0)
        if elapsed < 1.0:
            break
    assert elapsed < 1.0, f"split_occurrences took {elapsed:.2f}s"
    assert len(ra) == n and len(rb) == n
    for i in (0, 1, n // 2, n - 1):
        s, c = int(starts[i]), int(counts[i])
        assert np.array_equal(ra[i], np.arange(s, s + c))
        assert np.array_equal(rb[i], np.arange(s, s + c) * 7)
