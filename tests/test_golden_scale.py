"""Scale golden test: 2M-base FASTA, full CLI-equivalent run vs reference.

Marked slow-ish (~20 s CPU); exercises the real .fai partition + native
parser + device pipeline against the reference binary on non-toy data.
"""

import os
import subprocess

import numpy as np
import pytest

from hysortk_tpu import KmerConfig, kmer_count, read_dna_buffer
from hysortk_tpu.io import writer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_BIN = os.path.join(REPO, ".oracle", "hysortk_ref_K31_M17_L2_U50_E0")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE_BIN), reason="oracle not built"
)


def test_two_megabase_equality(tmp_path):
    rng = np.random.default_rng(99)
    n_reads, read_len = 2000, 1000
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = bases[rng.integers(0, 4, size=(n_reads, read_len))]
    reads[-300:] = reads[:300]  # duplicates for counts >= 2

    fasta = tmp_path / "big.fa"
    with open(fasta, "wb") as f:
        for i in range(n_reads):
            f.write(b">r%d\n" % i)
            f.write(reads[i].tobytes())
            f.write(b"\n")

    cfg = KmerConfig(k=31, m=17, lower=2, upper=50)
    codes, lengths = read_dna_buffer(str(fasta))
    assert codes.size == n_reads * read_len
    kmerlist, hist = kmer_count(codes, lengths, cfg)
    ours = dict(zip(kmerlist.decoded().tolist(), kmerlist.counts.tolist()))

    ref_out = tmp_path / "ref"
    ref_out.mkdir()
    proc = subprocess.run(
        [ORACLE_BIN, str(fasta), str(ref_out) + "/"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]

    theirs = {}
    with open(ref_out / "0.out", "rb") as f:
        for line in f:
            if line.strip():
                km, c = line.rstrip(b"\n").split(b"\t")
                theirs[km] = int(c)
    assert len(ours) == len(theirs)
    assert ours == theirs
    assert writer.parse_histogram(proc.stdout) == writer.parse_histogram(
        writer.format_histogram(hist)
    )
