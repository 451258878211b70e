"""FASTA indexing, partitioning, and parsing unit tests."""

import numpy as np

from hysortk_tpu.io import fasta as fasta_io
from hysortk_tpu import testing as oracle


def _write(tmp_path, reads, width=60, name="t.fa"):
    p = tmp_path / name
    with open(p, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">read{i} desc words\n")
            for j in range(0, len(r), width):
                f.write(r[j : j + width] + "\n")
    return str(p)


def test_generate_fai_matches_content(tmp_path):
    rng = np.random.default_rng(1)
    reads = oracle.random_reads(rng, 15, 10, 200)
    fa = _write(tmp_path, reads)
    recs = fasta_io.generate_fai(fa)
    assert [r.length for r in recs] == [len(r) for r in reads]
    assert [r.name for r in recs] == [f"read{i}" for i in range(len(reads))]
    # Offsets point at the first base.
    data = open(fa, "rb").read()
    for rec, read in zip(recs, reads):
        assert data[rec.offset : rec.offset + min(10, len(read))] == read[
            :10
        ].encode()[: min(10, len(read))]


def test_fai_roundtrip_file(tmp_path):
    rng = np.random.default_rng(2)
    reads = oracle.random_reads(rng, 8, 20, 100)
    fa = _write(tmp_path, reads)
    recs1 = fasta_io.generate_fai(fa, fa + ".fai")
    recs2 = fasta_io.parse_fai(fa + ".fai")
    assert recs1 == recs2


def test_partition_balances_bases():
    recs = [
        fasta_io.FaiRecord(f"r{i}", ln, 0, 60, 61)
        for i, ln in enumerate([100, 100, 100, 100, 400, 50, 50, 100, 100])
    ]
    parts = fasta_io.partition_records(recs, 3)
    # Every record assigned exactly once, contiguously.
    flat = [i for p in parts for i in p]
    assert flat == list(range(len(recs)))
    totals = [sum(recs[i].length for i in p) for p in parts]
    assert max(totals) <= 2 * (sum(totals) / 3)


def test_getreadowner():
    recs = [
        fasta_io.FaiRecord(f"r{i}", ln, 0, 60, 61)
        for i, ln in enumerate([100, 100, 100, 100, 400, 50, 50, 100, 100])
    ]
    parts = fasta_io.partition_records(recs, 3)
    displs = fasta_io.read_displacements(parts)
    assert displs[0] == 0 and displs[-1] == len(recs)
    # Every read id maps back to the shard whose part contains it.
    for s, idxs in enumerate(parts):
        for i in idxs:
            assert fasta_io.getreadowner(displs, i) == s
    # Vectorized form agrees with the scalar one.
    all_ids = np.arange(len(recs))
    owners = fasta_io.getreadowner(displs, all_ids)
    want = [s for s, idxs in enumerate(parts) for _ in idxs]
    assert owners.tolist() == want
    import pytest

    with pytest.raises(IndexError):
        fasta_io.getreadowner(displs, len(recs))
    with pytest.raises(IndexError):
        fasta_io.getreadowner(displs, -1)


def test_partition_more_shards_than_records():
    recs = [fasta_io.FaiRecord("a", 10, 0, 10, 11)]
    parts = fasta_io.partition_records(recs, 4)
    assert sum(len(p) for p in parts) == 1


def test_single_line_records(tmp_path):
    reads = ["ACGTACGTAC", "TTTTGGGGCC"]
    fa = _write(tmp_path, reads, width=1000)
    recs = fasta_io.generate_fai(fa)
    codes, lengths = fasta_io.read_records(fa, recs)
    want = fasta_io.CODE_LUT[
        np.frombuffer("".join(reads).encode(), dtype=np.uint8)
    ]
    assert np.array_equal(codes, want)


def test_read_subset_of_records(tmp_path):
    rng = np.random.default_rng(3)
    reads = oracle.random_reads(rng, 10, 30, 120)
    fa = _write(tmp_path, reads)
    recs = fasta_io.generate_fai(fa)
    codes, lengths = fasta_io.read_records(fa, recs[3:7])
    want = fasta_io.CODE_LUT[
        np.frombuffer("".join(reads[3:7]).encode(), dtype=np.uint8)
    ]
    assert np.array_equal(codes, want)
    assert lengths.tolist() == [len(r) for r in reads[3:7]]


def test_no_trailing_newline(tmp_path):
    p = tmp_path / "nt.fa"
    with open(p, "wb") as f:
        f.write(b">r0\nACGTACGTAC\n>r1\nTTGGCCAATT")  # no final \n
    recs = fasta_io.generate_fai(str(p))
    assert [r.length for r in recs] == [10, 10]
    codes, lengths = fasta_io.read_records(str(p), recs)
    want = fasta_io.CODE_LUT[np.frombuffer(b"ACGTACGTACTTGGCCAATT", dtype=np.uint8)]
    assert np.array_equal(codes, want)


def test_crlf_line_endings(tmp_path):
    p = tmp_path / "crlf.fa"
    with open(p, "wb") as f:
        f.write(b">r0\r\nACGTAC\r\nGTACGT\r\n>r1\r\nTTTT\r\n")
    recs = fasta_io.generate_fai(str(p))
    assert [r.length for r in recs] == [12, 4]
    codes, lengths = fasta_io.read_records(str(p), recs)
    want = fasta_io.CODE_LUT[np.frombuffer(b"ACGTACGTACGTTTTT", dtype=np.uint8)]
    assert np.array_equal(codes, want)


def test_empty_record(tmp_path):
    p = tmp_path / "er.fa"
    with open(p, "w") as f:
        f.write(">empty\n>r1\nACGT\n")
    recs = fasta_io.generate_fai(str(p))
    lens = [r.length for r in recs]
    assert lens == [0, 4]
