"""Fused Pallas key-build kernel vs the XLA reference implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from hysortk_tpu.io import fasta as fasta_io
from hysortk_tpu.ops import keybuild, kmer as kmer_ops, pallas_sort, sort as sort_ops
from hysortk_tpu import testing as oracle

pallas_sort.set_interpret(True)


@pytest.mark.parametrize("k", [15, 31, 55, 96])
def test_fused_matches_xla_keybuild(k):
    rng = np.random.default_rng(k)
    reads = oracle.random_reads(rng, 12, k + 5, 3 * k)
    codes, lengths = fasta_io.reads_to_codes(reads)
    flat, valid = fasta_io.flatten_for_device(codes, lengths, k, 256)

    codes_j = jnp.asarray(flat, jnp.int8)
    valid_j = jnp.asarray(valid)

    want = sort_ops.apply_sentinel(
        ~valid_j, kmer_ops.canonical_words(codes_j.astype(jnp.int32), k)
    )
    got = keybuild.canonical_keys_fused(codes_j, valid_j, k, block_rows=2)
    for w, (g, x) in enumerate(zip(got, want)):
        assert np.array_equal(np.asarray(g), np.asarray(x)), f"word {w}"


def test_fused_multi_block():
    k = 31
    rng = np.random.default_rng(7)
    reads = oracle.random_reads(rng, 40, 50, 200)
    codes, lengths = fasta_io.reads_to_codes(reads)
    flat, valid = fasta_io.flatten_for_device(codes, lengths, k, 1024)
    codes_j = jnp.asarray(flat, jnp.int8)
    valid_j = jnp.asarray(valid)
    want = sort_ops.apply_sentinel(
        ~valid_j, kmer_ops.canonical_words(codes_j.astype(jnp.int32), k)
    )
    got = keybuild.canonical_keys_fused(codes_j, valid_j, k, block_rows=2)
    for g, x in zip(got, want):
        assert np.array_equal(np.asarray(g), np.asarray(x))


def test_pipeline_with_fused_keybuild():
    from hysortk_tpu import KmerConfig, count_reads

    rng = np.random.default_rng(71)
    reads = oracle.random_reads(rng, 25, 35, 90)
    reads = reads + reads[:10]
    codes, lengths = fasta_io.reads_to_codes(reads)
    cfg = KmerConfig(k=31, m=17, lower=2, upper=50, fuse_keybuild=True,
                     pad_multiple=256)
    got, hist = count_reads(codes, lengths, cfg)
    cfg0 = KmerConfig(k=31, m=17, lower=2, upper=50, pad_multiple=256)
    want, hist0 = count_reads(codes, lengths, cfg0)
    assert got.as_dict() == want.as_dict()
    assert np.array_equal(hist, hist0)
