"""Native C++ host-IO library vs the numpy reference semantics."""

import numpy as np
import pytest

from hysortk_tpu.io import fasta as fasta_io
from hysortk_tpu.io import native
from hysortk_tpu.ops import kmer as kmer_ops
from hysortk_tpu import testing as oracle

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def test_pack_codes_matches_lut():
    raw = np.frombuffer(b"ACGTacgtNnXx\x00\xff", dtype=np.uint8)
    got = native.pack_codes(raw)
    want = fasta_io.CODE_LUT[raw]
    assert np.array_equal(got, want)


def test_decode_keys_matches_numpy():
    rng = np.random.default_rng(2)
    for k in (15, 31, 55):
        w = (k + 15) // 16
        strs = ["".join(rng.choice(list("ACGT"), size=k)) for _ in range(50)]
        keys = np.stack([kmer_ops.encode_kmer(s) for s in strs])
        got = native.decode_keys(keys, k)
        assert [x.decode() for x in got] == strs


def test_format_output():
    keys = np.stack(
        [kmer_ops.encode_kmer("ACGTACGTACGTACG"),
         kmer_ops.encode_kmer("TTTTTTTTTTTTTTT")]
    )
    counts = np.array([3, 12345], dtype=np.int32)
    text = native.format_output(keys, counts, 15)
    assert text == b"ACGTACGTACGTACG\t3\nTTTTTTTTTTTTTTT\t12345\n"


def test_strip_and_pack_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    reads = oracle.random_reads(rng, 40, 10, 300)
    fa = tmp_path / "x.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n")
            for j in range(0, len(r), 70):
                f.write(r[j : j + 70] + "\n")
    recs = fasta_io.generate_fai(str(fa))
    codes, lengths = fasta_io.read_records(str(fa), recs)
    # Independent expectation.
    want = fasta_io.CODE_LUT[
        np.frombuffer("".join(reads).encode(), dtype=np.uint8)
    ]
    assert np.array_equal(codes, want)
    assert lengths.tolist() == [len(r) for r in reads]


def test_native_pack_2bit_matches_numpy():
    import numpy as np

    from hysortk_tpu.io import native, supermer

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 4096).astype(np.int8)
    got = native.pack_2bit(codes.astype(np.uint8))
    # numpy reference path (force fallback by using a pad-triggering length)
    want = supermer.pack_codes_2bit(np.concatenate([codes, np.zeros(3, np.int8)]))
    # first 4096/16 words must agree (the 3 pad codes only touch the tail)
    assert np.array_equal(got, want[:256])


def test_native_run_boundaries_matches_numpy():
    """hk_run_boundaries vs the numpy formulation on fuzzed streams with
    gaps, dest changes, and the 250-base cap."""
    import numpy as np

    from hysortk_tpu.io import native, supermer as supermer_io

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    for trial in range(10):
        n = int(rng.integers(50, 4000))
        k = int(rng.integers(5, 40))
        valid = rng.random(n) < 0.8
        valid[-min(k, n):] = False
        dest = rng.integers(0, 4, size=n).astype(np.int32)
        # Long same-dest stretches to exercise the cap.
        if trial % 2:
            dest[:] = 1
            valid[: n // 2] = True
        max_kmers = supermer_io.MAX_SUPERMER_LEN - k + 1

        nat = native.run_boundaries(valid, dest, max_kmers)
        # numpy formulation (the fallback body of run_boundaries)
        idx = np.flatnonzero(valid)
        if idx.size == 0:
            assert nat[0].size == 0
            continue
        d = dest[idx].astype(np.int64)
        gap = np.empty(idx.size, dtype=bool)
        gap[0] = True
        gap[1:] = (idx[1:] != idx[:-1] + 1) | (d[1:] != d[:-1])
        pos_in_run = np.arange(idx.size) - np.maximum.accumulate(
            np.where(gap, np.arange(idx.size), 0)
        )
        gap = gap | (pos_in_run % max_kmers == 0) & (pos_in_run > 0)
        starts = np.flatnonzero(gap)
        kmers = np.diff(np.concatenate([starts, [idx.size]]))
        np.testing.assert_array_equal(nat[0], idx[starts])
        np.testing.assert_array_equal(nat[1], kmers)
        np.testing.assert_array_equal(nat[2], d[starts].astype(np.int32))


def test_format_output_parallel_matches_fallback():
    """The OpenMP two-pass formatter (per-chunk byte offsets) must be
    byte-identical to the Python rendering at sizes spanning many chunks
    and counts spanning every digit width."""
    rng = np.random.default_rng(11)
    n, k = 20000, 31
    w = (k + 15) // 16
    keys = rng.integers(0, 2**32, size=(n, w), dtype=np.uint32)
    counts = np.concatenate(
        [np.array([1, 9, 10, 99, 100, 2**31 - 1], dtype=np.int32),
         rng.integers(1, 10**6, size=n - 6, dtype=np.int32)]
    )
    got = native.format_output(keys, counts, k)
    dec = native.decode_keys(keys, k)
    want = b"".join(
        d + b"\t" + str(int(c)).encode() + b"\n" for d, c in zip(dec, counts)
    )
    assert got == want


def test_write_output_file_chunked(tmp_path):
    """write_output_file with a tiny chunk_rows must produce the same file
    as one-shot formatting (exercises the reused-buffer chunk loop)."""
    from hysortk_tpu.io.writer import write_output_file, format_output_lines
    from hysortk_tpu.pipeline import KmerList

    rng = np.random.default_rng(5)
    n, k = 1000, 21
    w = (k + 15) // 16
    keys = rng.integers(0, 2**32, size=(n, w), dtype=np.uint32)
    counts = rng.integers(1, 1000, size=n, dtype=np.int32)
    kl = KmerList(keys, counts, k)
    path = write_output_file(kl, str(tmp_path / "chunked"), chunk_rows=64)
    with open(path, "rb") as f:
        assert f.read() == format_output_lines(kl)
