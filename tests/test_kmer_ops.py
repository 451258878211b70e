"""Unit tests: packed key construction vs hand-computed / oracle values."""

import jax.numpy as jnp
import numpy as np
import pytest

from hysortk_tpu.io import fasta as fasta_io
from hysortk_tpu.ops import kmer as kmer_ops
from hysortk_tpu import testing as oracle


def _codes(s: str) -> jnp.ndarray:
    arr, _ = fasta_io.reads_to_codes([s])
    return jnp.asarray(arr, dtype=jnp.int32)


def test_sliding_pack16_hand():
    s = "ACGT" * 5  # 20 bases
    p = np.asarray(kmer_ops.sliding_pack16(_codes(s)))
    # First window "ACGTACGTACGTACGT" big-endian: 0b00_01_10_11 repeated
    expect = 0
    for c in [0, 1, 2, 3] * 4:
        expect = (expect << 2) | c
    assert p[0] == expect
    # Second window starts at C: codes 1,2,3,0 repeated
    expect2 = 0
    for c in [1, 2, 3, 0] * 4:
        expect2 = (expect2 << 2) | c
    assert p[1] == expect2


@pytest.mark.parametrize("k", [5, 15, 16, 17, 31, 32, 33, 55, 64, 96])
def test_forward_and_decode_roundtrip(k):
    rng = np.random.default_rng(7)
    s = "".join(rng.choice(list("ACGT"), size=k + 40))
    codes = _codes(s + "A" * 32)  # slack so rolls don't wrap into windows
    p16 = kmer_ops.sliding_pack16(codes)
    fwd = kmer_ops.forward_words(p16, k)
    keys = np.stack([np.asarray(w) for w in fwd], axis=-1)
    n = len(s) - k + 1
    decoded = kmer_ops.decode_keys(keys[:n], k)
    for i in range(n):
        assert decoded[i].decode() == s[i : i + k], f"pos {i}"


@pytest.mark.parametrize("k", [5, 15, 16, 17, 31, 32, 33, 55, 64, 96])
def test_twin_matches_revcomp(k):
    rng = np.random.default_rng(11)
    s = "".join(rng.choice(list("ACGT"), size=k + 25))
    codes = _codes(s + "A" * 32)
    p16 = kmer_ops.sliding_pack16(codes)
    fwd = kmer_ops.forward_words(p16, k)
    twn = kmer_ops.twin_words(fwd, k)
    keys = np.stack([np.asarray(w) for w in twn], axis=-1)
    n = len(s) - k + 1
    decoded = kmer_ops.decode_keys(keys[:n], k)
    for i in range(n):
        assert decoded[i].decode() == oracle.revcomp(s[i : i + k]), f"pos {i}"


@pytest.mark.parametrize("k", [15, 31, 32, 55, 96])
def test_canonical_matches_oracle(k):
    rng = np.random.default_rng(13)
    s = "".join(rng.choice(list("ACGT"), size=k + 50))
    codes = _codes(s + "A" * 32)
    words = kmer_ops.canonical_words(codes, k)
    keys = np.stack([np.asarray(w) for w in words], axis=-1)
    n = len(s) - k + 1
    decoded = kmer_ops.decode_keys(keys[:n], k)
    for i in range(n):
        assert decoded[i].decode() == oracle.canonical(s[i : i + k]), f"pos {i}"


def test_palindrome_canonical():
    # Self-reverse-complementary k-mer: canonical == itself.
    s = "ACGT" * 4  # ACGTACGTACGTACGT, k=16 palindrome
    assert oracle.canonical(s) == s
    codes = _codes(s + "A" * 32)
    words = kmer_ops.canonical_words(codes, 16)
    keys = np.stack([np.asarray(w) for w in words], axis=-1)
    assert kmer_ops.decode_keys(keys[:1], 16)[0].decode() == s


def test_encode_decode_inverse():
    s = "ACGTTTACGGGACGTAACGTTTACGGGACGT"  # 31
    key = kmer_ops.encode_kmer(s)
    assert kmer_ops.decode_keys(key[None, :], len(s))[0].decode() == s


def test_superfasthash_vectors():
    """Fixed vectors generated from an independently-compiled build of the
    public algorithm (the reference ships the same function as unused API
    surface, src/hashfuncs.cpp:132-175)."""
    from hysortk_tpu.ops.hashes import superfasthash

    assert superfasthash(b"") == 0
    assert superfasthash(b"a") == 291415938
    assert superfasthash(b"ACGTACGT") == 402222667
    assert superfasthash(b"hello world") == 2794219650


@pytest.mark.parametrize("k", [15, 16, 31, 32, 55, 96])
def test_extend_kmer_matches_encode(k):
    """extend_kmer == encode of the shifted string at every word-boundary
    k (reference Kmer::GetExtension, include/kmer.hpp:248-262)."""
    from hysortk_tpu.ops.kmer import encode_kmer, extend_kmer

    rng = np.random.default_rng(k)
    s = "".join(rng.choice(list("ACGT"), size=k))
    for i, base in enumerate("ACGT"):
        got = extend_kmer(encode_kmer(s).astype(np.uint32), i, k)
        assert np.array_equal(got, encode_kmer(s[1:] + base))
