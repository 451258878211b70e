"""Property fuzz: random configs + messy reads vs the brute-force oracle."""

import numpy as np
import pytest

from hysortk_tpu import KmerConfig, kmer_count
from hysortk_tpu.io import fasta as fasta_io
from hysortk_tpu import testing as oracle


@pytest.mark.parametrize("trial", range(10))
def test_random_config_matches_oracle(trial):
    rng = np.random.default_rng(1000 + trial)
    k = int(rng.integers(4, 97))
    m = int(rng.integers(1, min(k, 33)))
    lower = int(rng.integers(1, 4))
    upper = int(rng.integers(lower, lower + 60))
    cfg = KmerConfig(
        k=k, m=m, lower=lower, upper=upper, pad_multiple=128,
    )

    # Messy read set: Ns, lowercase, short reads, empty-ish, duplicates.
    n_reads = int(rng.integers(5, 40))
    reads = []
    for _ in range(n_reads):
        ln = int(rng.integers(1, 3 * k))
        alphabet = "ACGTacgtN" if rng.random() < 0.4 else "ACGT"
        reads.append("".join(rng.choice(list(alphabet), size=ln)))
    reads += reads[: int(rng.integers(0, n_reads))]

    codes, lengths = fasta_io.reads_to_codes(reads)
    kmerlist, hist = kmer_count(codes, lengths, cfg)
    got = kmerlist.as_dict()
    want = {
        km.encode(): v
        for km, v in oracle.oracle_filtered(reads, k, lower, upper).items()
    }
    assert got == want, (k, m, lower, upper)
    want_hist = oracle.oracle_histogram(
        oracle.oracle_filtered(reads, k, lower, upper)
    )
    got_hist = {c: int(n) for c, n in enumerate(hist) if n > 0}
    assert got_hist == want_hist


@pytest.mark.parametrize("trial", range(4))
def test_random_config_sharded_and_streaming(trial):
    import jax

    rng = np.random.default_rng(2000 + trial)
    k = int(rng.integers(8, 64))
    m = int(rng.integers(1, min(k, 20)))
    lower = int(rng.integers(1, 3))
    upper = int(rng.integers(lower + 5, lower + 80))
    combiner = bool(rng.random() < 0.5)
    routing = ["range", "minimizer", "kmer_hash", "supermer"][
        int(rng.integers(4))
    ]
    if routing == "supermer":
        combiner = False  # combiner is a key-exchange concept; no exchange here
    classifier = "heavy_hitter" if rng.random() < 0.5 else "plain"
    cfg = KmerConfig(
        k=k, m=m, lower=lower, upper=upper, pad_multiple=128,
        combiner=combiner, routing=routing, classifier=classifier,
        capacity_factor=3.0,
    )

    n_reads = int(rng.integers(10, 50))
    reads = [
        "".join(rng.choice(list("ACGT"), size=int(rng.integers(k, 3 * k))))
        for _ in range(n_reads)
    ]
    reads += reads[: n_reads // 2]
    codes, lengths = fasta_io.reads_to_codes(reads)
    want = {
        km.encode(): v
        for km, v in oracle.oracle_filtered(reads, k, lower, upper).items()
    }

    if len(jax.devices()) >= 2:
        from hysortk_tpu.parallel.pipeline import count_reads_sharded

        sh_list, _ = count_reads_sharded(codes, lengths, cfg)
        assert sh_list.as_dict() == want, (k, m, lower, upper, combiner, routing)

    from hysortk_tpu.runtime.scheduler import count_reads_streaming

    cfg_st = cfg if cfg.routing != "supermer" else __import__(
        "dataclasses"
    ).replace(cfg, routing="range")
    st_list, _ = count_reads_streaming(
        codes, lengths, cfg_st, batch_bases=max(4 * k, 64)
    )
    assert st_list.as_dict() == want, (k, m, lower, upper)
