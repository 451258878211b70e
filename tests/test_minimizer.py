"""Minimizer destination scan vs an explicit window-min oracle."""

import jax.numpy as jnp
import numpy as np

from hysortk_tpu.io import fasta as fasta_io
from hysortk_tpu.ops import hashes, kmer as kmer_ops, minimizer
from hysortk_tpu import testing as oracle


def _device_hash_of_mmer(s: str) -> int:
    """Host-side recomputation of the device m-mer hash for the oracle."""
    key = kmer_ops.encode_kmer(s)
    words = [jnp.asarray(key[w : w + 1], dtype=jnp.uint32) for w in range(key.size)]
    return int(np.asarray(hashes.mix_words(words))[0])


def test_sliding_window_min_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 31, size=200).astype(np.uint32)
    for w in (1, 2, 3, 7, 15, 16, 31):
        got = np.asarray(minimizer.sliding_window_min(jnp.asarray(x), w))
        for i in range(len(x) - w):
            assert got[i] == x[i : i + w].min(), (w, i)


def test_destinations_match_oracle():
    rng = np.random.default_rng(9)
    read = "".join(rng.choice(list("ACGT"), size=120))
    k, m, nbuckets = 31, 17, 13
    codes, _ = fasta_io.reads_to_codes([read + "A" * 64])
    dests = np.asarray(
        minimizer.kmer_destinations(jnp.asarray(codes, jnp.int32), k, m, nbuckets)
    )
    want = oracle.oracle_minimizer_dests(
        read, k, m, nbuckets, lambda mm: _device_hash_of_mmer(mm)
    )
    n = len(read) - k + 1
    assert dests[:n].tolist() == want


def test_equal_kmers_get_equal_destinations():
    # The ownership property the exchange relies on.
    read = "ACGTTGCACGTACGTTGCAACGTTGCACGTA"
    k, m = 15, 7
    codes, _ = fasta_io.reads_to_codes([read * 4 + "A" * 64])
    dests = np.asarray(
        minimizer.kmer_destinations(jnp.asarray(codes, jnp.int32), k, m, 8)
    )
    s = oracle.normalize(read * 4)
    seen = {}
    for i in range(len(s) - k + 1):
        km = oracle.canonical(s[i : i + k])
        if km in seen:
            assert dests[i] == seen[km], km
        seen[km] = dests[i]


def test_large_minimizer_m_beyond_32():
    """m > 32 (multi-word minimizers) — the reference allows any M < K
    (Makefile:50-52); the restriction to 2-word minimizers is lifted."""
    import numpy as np
    import jax

    from hysortk_tpu import KmerConfig
    from hysortk_tpu.io import fasta as fasta_io
    from hysortk_tpu import testing as oracle

    cfg = KmerConfig(k=55, m=40, lower=1, upper=100, routing="minimizer",
                     pad_multiple=128)
    assert cfg.mwords == 3
    rng = np.random.default_rng(7)
    reads = oracle.random_reads(rng, 16, 60, 120) * 2
    codes, lengths = fasta_io.reads_to_codes(reads)
    if len(jax.devices()) >= 2:
        from hysortk_tpu.parallel.pipeline import count_reads_sharded

        kl, _ = count_reads_sharded(codes, lengths, cfg)
        want = {
            k.encode(): v
            for k, v in oracle.oracle_filtered(reads, 55, 1, 100).items()
        }
        assert kl.as_dict() == want
