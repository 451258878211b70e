"""Golden test: byte-identical output vs the reference HySortK binary.

The reference is compiled from /root/reference against the single-rank MPI
shim (tools/build_reference.sh). Comparison is on the sorted union of
{kmer, count} lines and on the histogram text — per SURVEY.md §7, within-file
order is backend-defined, set equality is the contract.
"""

import os
import subprocess

import numpy as np
import pytest

from hysortk_tpu import KmerConfig, kmer_count, read_dna_buffer
from hysortk_tpu.io import writer
from hysortk_tpu import testing as oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_BIN = os.path.join(REPO, ".oracle", "hysortk_ref_K31_M17_L2_U50_E0")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE_BIN),
    reason="reference oracle not built (run tools/build_reference.sh)",
)


@pytest.fixture(scope="module")
def fasta(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden")
    rng = np.random.default_rng(123)
    reads = oracle.random_reads(rng, 120, 35, 200)
    reads = reads + reads[:60] + reads[:30] + reads[:10]
    path = tmp / "golden.fa"
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">read{i}\n")
            for j in range(0, len(r), 60):
                f.write(r[j : j + 60] + "\n")
    return str(path)


def test_output_matches_reference_binary(fasta, tmp_path):
    cfg = KmerConfig(k=31, m=17, lower=2, upper=50)

    # Ours.
    codes, lengths = read_dna_buffer(fasta)  # also builds the .fai
    kmerlist, hist = kmer_count(codes, lengths, cfg)
    ours = dict(
        zip(
            (k.decode() for k in kmerlist.decoded()),
            (int(c) for c in kmerlist.counts),
        )
    )

    # Reference binary.
    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    proc = subprocess.run(
        [ORACLE_BIN, fasta, str(ref_out) + "/"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    theirs = {}
    with open(ref_out / "0.out") as f:
        for line in f:
            if line.strip():
                km, c = line.split("\t")
                theirs[km] = int(c)

    assert ours == theirs
    assert len(ours) > 0

    # Histogram text equality.
    ref_hist = writer.parse_histogram(proc.stdout)
    our_hist = writer.parse_histogram(writer.format_histogram(hist))
    assert our_hist == ref_hist


def test_supermer_routing_matches_reference_binary(fasta, tmp_path):
    """Golden equality for the supermer-dispatch pipeline: the reference's
    own exchange architecture (supermers move, keys don't) must reproduce
    the reference binary's {kmer, count} set byte-for-byte."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual CPU mesh")
    from hysortk_tpu.io import fasta as fasta_io
    from hysortk_tpu.parallel.mesh import make_mesh
    from hysortk_tpu.parallel.supermer_route import (
        count_reads_supermer, count_reads_supermer_exchange,
    )

    outdir = tmp_path / "ref_out"
    outdir.mkdir()
    proc = subprocess.run(
        [ORACLE_BIN, fasta, str(outdir) + "/"],
        capture_output=True, text=True, timeout=600,
    )
    proc.check_returncode()
    want = writer.parse_output_files(str(outdir))

    cfg = KmerConfig(k=31, m=17, lower=2, upper=50, routing="supermer")
    codes, lengths = read_dna_buffer(fasta)
    mesh = make_mesh()
    kl, _ = count_reads_supermer(codes, lengths, cfg, mesh)
    assert kl.as_dict() == want
    kl2, _ = count_reads_supermer_exchange(codes, lengths, cfg, mesh)
    assert kl2.as_dict() == want


def test_sharded_spill_matches_reference_binary(fasta, tmp_path, monkeypatch):
    """Golden equality for the exact-capacity range exchange under FORCED
    spill: the planned capacity is shrunk so segments routinely overhang
    into the spill lane (ops/spill.py), and the sharded result must still
    reproduce the reference binary's {kmer, count} set exactly."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual CPU mesh")
    from hysortk_tpu.parallel import pipeline as sp
    from hysortk_tpu.parallel.mesh import make_mesh
    from hysortk_tpu.parallel.pipeline import count_reads_sharded

    outdir = tmp_path / "ref_out"
    outdir.mkdir()
    proc = subprocess.run(
        [ORACLE_BIN, fasta, str(outdir) + "/"],
        capture_output=True, text=True, timeout=600,
    )
    proc.check_returncode()
    want = writer.parse_output_files(str(outdir))

    cfg = KmerConfig(k=31, m=17, lower=2, upper=50)
    codes, lengths = read_dna_buffer(fasta)
    # ~26k valid kmers over 64 segments => mean ~410; m=256 forces every
    # segment through the spill protocol (retry doubles keep the split).
    monkeypatch.setattr(sp, "range_capacity", lambda *a, **k: 256 + 128)
    kl, _ = count_reads_sharded(codes, lengths, cfg, make_mesh())
    assert kl.as_dict() == want
