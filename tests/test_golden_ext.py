"""Golden test vs the reference binary compiled with EXTENSION=1.

The reference's EXT output files still carry only `kmer\\tcount` lines (the
pos/rid payloads are in-memory API state, src/hysortk.cpp:159-162), so file
equality checks that the EXT code path produces identical counts; payload
semantics are covered against the brute-force oracle in test_extension.py.
"""

import os
import subprocess

import numpy as np
import pytest

from hysortk_tpu import KmerConfig, count_reads_ext, read_dna_buffer
from hysortk_tpu import testing as oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_BIN = os.path.join(REPO, ".oracle", "hysortk_ref_K31_M17_L2_U50_E1")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE_BIN),
    reason="EXT oracle not built (tools/build_reference.sh 31 17 2 50 1)",
)


def test_ext_counts_match_reference_binary(tmp_path):
    rng = np.random.default_rng(321)
    reads = oracle.random_reads(rng, 90, 35, 150)
    reads = reads + reads[:45] + reads[:20]
    fasta = tmp_path / "ext.fa"
    with open(fasta, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")

    cfg = KmerConfig(k=31, m=17, lower=2, upper=50, extension=True)
    codes, lengths = read_dna_buffer(str(fasta))
    result, _ = count_reads_ext(codes, lengths, cfg)
    ours = dict(
        zip(
            (x.decode() for x in result.decoded()),
            (int(c) for c in result.counts),
        )
    )

    ref_out = tmp_path / "ref"
    ref_out.mkdir()
    proc = subprocess.run(
        [ORACLE_BIN, str(fasta), str(ref_out) + "/"],
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

    # Payload sanity: total occurrences equal counts.
    for cnt, p, r in zip(result.counts, result.pos, result.rid):
        assert len(p) == len(r) == int(cnt)


def test_sharded_ext_counts_match_reference_binary(tmp_path):
    """Sharded (range-exchange) EXT vs the EXTENSION=1 reference binary."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    from hysortk_tpu.parallel.pipeline import count_reads_sharded_ext

    rng = np.random.default_rng(654)
    reads = oracle.random_reads(rng, 70, 35, 140)
    reads = reads + reads[:30]
    fasta = tmp_path / "ext_sh.fa"
    with open(fasta, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")

    cfg = KmerConfig(k=31, m=17, lower=2, upper=50, extension=True)
    codes, lengths = read_dna_buffer(str(fasta))
    result, _ = count_reads_sharded_ext(codes, lengths, cfg)
    ours = dict(
        zip(
            (x.decode() for x in result.decoded()),
            (int(c) for c in result.counts),
        )
    )

    ref_out = tmp_path / "ref"
    ref_out.mkdir()
    proc = subprocess.run(
        [ORACLE_BIN, str(fasta), str(ref_out) + "/"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    theirs = {}
    with open(ref_out / "0.out") as f:
        for line in f:
            if line.strip():
                km, c = line.split("\t")
                theirs[km] = int(c)
    assert ours == theirs and len(ours) > 0

    # Payload exactness vs the brute-force oracle: every (rid, pos)
    # occurrence of every kept kmer, order-free.
    occ = oracle.oracle_occurrences(reads, cfg.k)
    for km, p, r, cnt in zip(
        (x.decode() for x in result.decoded()),
        result.pos, result.rid, result.counts,
    ):
        assert len(p) == len(r) == int(cnt)
        assert set(zip(r.tolist(), p.tolist())) == occ[km]
