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
