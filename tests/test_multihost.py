"""Multi-host module on a single process (degenerate path) + helpers."""

import numpy as np
import pytest

import jax

from hysortk_tpu import KmerConfig
from hysortk_tpu.parallel import multihost
from hysortk_tpu import testing as oracle


def _write_fasta(tmp_path, reads, name="mh.fa"):
    p = tmp_path / name
    with open(p, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    return str(p)


def test_read_my_shard_single_process(tmp_path):
    rng = np.random.default_rng(5)
    reads = oracle.random_reads(rng, 20, 30, 80)
    fasta = _write_fasta(tmp_path, reads)
    cfg = KmerConfig(k=31, m=17, lower=1, upper=50)
    codes, lengths = multihost.read_my_shard(fasta, cfg)
    assert lengths.size == len(reads)
    assert codes.size == sum(len(r) for r in reads)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_count_fasta_multihost_single_process(tmp_path):
    rng = np.random.default_rng(6)
    reads = oracle.random_reads(rng, 40, 35, 90)
    reads = reads + reads[:20]
    fasta = _write_fasta(tmp_path, reads)
    cfg = KmerConfig(k=31, m=17, lower=2, upper=50, pad_multiple=256)
    kmerlist, hist = multihost.count_fasta_multihost(fasta, cfg)
    want = {
        k.encode(): v
        for k, v in oracle.oracle_filtered(reads, 31, 2, 50).items()
    }
    assert kmerlist.as_dict() == want
    want_hist = oracle.oracle_histogram(
        oracle.oracle_filtered(reads, 31, 2, 50)
    )
    got_hist = {c: int(n) for c, n in enumerate(hist) if n > 0}
    assert got_hist == want_hist
