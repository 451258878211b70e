"""Golden tests vs the reference binary across K (1/2/4-word keys)."""

import os
import subprocess

import numpy as np
import pytest

from hysortk_tpu import KmerConfig, kmer_count, read_dna_buffer
from hysortk_tpu import testing as oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # (k, m, lower, upper) — matching tools/build_reference.sh invocations.
    (15, 7, 1, 100),
    (55, 17, 2, 50),
]


def _oracle_bin(k, m, lo, hi):
    return os.path.join(REPO, ".oracle", f"hysortk_ref_K{k}_M{m}_L{lo}_U{hi}_E0")


@pytest.mark.parametrize("k,m,lo,hi", CONFIGS)
def test_multik_matches_reference_binary(k, m, lo, hi, tmp_path):
    binary = _oracle_bin(k, m, lo, hi)
    if not os.path.exists(binary):
        pytest.skip(f"oracle {binary} not built")

    rng = np.random.default_rng(k * 100 + m)
    reads = oracle.random_reads(rng, 80, max(k + 5, 30), 150)
    reads = reads + reads[:40] + reads[:15]
    fasta = tmp_path / f"g{k}.fa"
    with open(fasta, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")

    cfg = KmerConfig(k=k, m=m, lower=lo, upper=hi)
    codes, lengths = read_dna_buffer(str(fasta))
    kmerlist, _ = kmer_count(codes, lengths, cfg)
    ours = dict(
        zip(
            (x.decode() for x in kmerlist.decoded()),
            (int(c) for c in kmerlist.counts),
        )
    )

    ref_out = tmp_path / "ref"
    ref_out.mkdir()
    proc = subprocess.run(
        [binary, str(fasta), str(ref_out) + "/"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    theirs = {}
    with open(ref_out / "0.out") as f:
        for line in f:
            if line.strip():
                km, c = line.split("\t")
                theirs[km] = int(c)

    assert ours == theirs
    assert len(ours) > 0
