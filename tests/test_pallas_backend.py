"""End-to-end pipeline with sort_backend='pallas' (interpret on CPU)."""

import numpy as np
import pytest

from hysortk_tpu import KmerConfig, count_reads
from hysortk_tpu.io import fasta as fasta_io
from hysortk_tpu.ops import pallas_sort
from hysortk_tpu import testing as oracle

pallas_sort.set_interpret(True)


def test_pipeline_with_pallas_sort_matches_oracle():
    rng = np.random.default_rng(55)
    reads = oracle.random_reads(rng, 30, 35, 80)
    reads = reads + reads[:12]
    cfg = KmerConfig(
        k=31, m=17, lower=2, upper=50, sort_backend="pallas", pad_multiple=256
    )
    codes, lengths = fasta_io.reads_to_codes(reads)
    kmerlist, hist = count_reads(codes, lengths, cfg)
    want = {
        k.encode(): v
        for k, v in oracle.oracle_filtered(reads, 31, 2, 50).items()
    }
    assert kmerlist.as_dict() == want

    # Cross-check against the XLA backend.
    cfg_xla = KmerConfig(k=31, m=17, lower=2, upper=50, pad_multiple=256)
    xla_list, xla_hist = count_reads(codes, lengths, cfg_xla)
    assert kmerlist.as_dict() == xla_list.as_dict()
    assert np.array_equal(hist, xla_hist)
