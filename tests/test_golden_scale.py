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


def test_sixteen_megabase_sharded_streaming_bounded(tmp_path):
    """16 Mb through the sharded STREAMING path vs the reference binary,
    with the bounded-memory property asserted: the largest device batch
    stays O(batch_bases), independent of the input size (the reference's
    bounded-memory round loop, src/kmerops.cpp:906-1007)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    from unittest import mock

    from hysortk_tpu.parallel import pipeline as sp

    rng = np.random.default_rng(7)
    n_reads, read_len = 16000, 1000
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = bases[rng.integers(0, 4, size=(n_reads, read_len))]
    reads[-2400:] = reads[:2400]

    fasta = tmp_path / "big16.fa"
    with open(fasta, "wb") as f:
        for i in range(n_reads):
            f.write(b">r%d\n" % i)
            f.write(reads[i].tobytes())
            f.write(b"\n")

    cfg = KmerConfig(k=31, m=17, lower=2, upper=50)
    codes, lengths = read_dna_buffer(str(fasta))

    batch_bases = 1 << 21  # 2 Mb batches over a 16 Mb input
    seen_shapes = []
    orig = sp._count_sharded_jit

    def spy(codes_j, valid_j, assign, **kw):
        seen_shapes.append(int(codes_j.shape[0]))
        return orig(codes_j, valid_j, assign, **kw)

    with mock.patch.object(sp, "_count_sharded_jit", spy):
        kmerlist, hist = sp.count_reads_sharded_streaming(
            codes, lengths, cfg, batch_bases=batch_bases
        )
    # Bounded memory: every device batch is O(batch_bases), far below the
    # input size; and the stream reused one compiled shape.
    assert max(seen_shapes) <= 2 * batch_bases
    assert max(seen_shapes) < codes.size // 3
    assert len(set(seen_shapes)) == 1, "shape churn would recompile per batch"

    ours = dict(zip(kmerlist.decoded().tolist(), kmerlist.counts.tolist()))

    ref_out = tmp_path / "ref16"
    ref_out.mkdir()
    proc = subprocess.run(
        [ORACLE_BIN, str(fasta), str(ref_out) + "/"],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    theirs = {}
    with open(ref_out / "0.out", "rb") as f:
        for line in f:
            if line.strip():
                km, c = line.rstrip(b"\n").split(b"\t")
                theirs[km] = int(c)
    assert ours == theirs
    assert len(ours) > 0
