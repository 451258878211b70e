"""Fused Pallas count kernel vs the XLA scan implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from hysortk_tpu.ops import count as count_ops
from hysortk_tpu.ops import pallas_count, pallas_sort
from hysortk_tpu.ops import sort as sort_ops

pallas_sort.set_interpret(True)

FULL = np.uint32(0xFFFFFFFF)


def _xla_reference(words, lower, upper):
    svalid = sort_ops.sentinel_valid([jnp.asarray(w) for w in words])
    head, cnt = count_ops.run_length_count(
        svalid, [jnp.asarray(w) for w in words]
    )
    keep = count_ops.frequency_filter(head, cnt, lower, upper)
    return np.asarray(cnt), np.asarray(keep)


def _make_sorted(rng, n, n_words, n_distinct, invalid_frac):
    """Sorted multiword keys with duplicates and a sentinel tail."""
    distinct = np.sort(
        rng.integers(0, 1 << 30, size=(n_distinct, n_words)).view(np.uint32),
        axis=0,
    )
    idx = np.sort(rng.integers(0, n_distinct, size=n))
    words = [distinct[idx, w].copy() for w in range(n_words)]
    n_invalid = int(n * invalid_frac)
    if n_invalid:
        for w in range(n_words):
            words[w][n - n_invalid :] = FULL
    return words


@pytest.mark.parametrize("n_words", [1, 2, 4])
@pytest.mark.parametrize("invalid_frac", [0.0, 0.3])
def test_matches_xla(n_words, invalid_frac):
    rng = np.random.default_rng(n_words * 10 + int(invalid_frac * 10))
    n = 1024
    words = _make_sorted(rng, n, n_words, 60, invalid_frac)
    want_cnt, want_keep = _xla_reference(words, 2, 8)
    got_cnt, got_keep = pallas_count.run_length_count_filter(
        [jnp.asarray(w) for w in words], 2, 8, block_rows=2
    )
    assert np.array_equal(np.asarray(got_cnt), want_cnt)
    assert np.array_equal(np.asarray(got_keep), np.asarray(want_keep))


def test_run_spanning_blocks():
    # One giant run crossing several blocks: the carry must propagate.
    n = 1024
    words = [np.zeros(n, dtype=np.uint32)]
    words[0][:] = 7  # single key everywhere
    got_cnt, got_keep = pallas_count.run_length_count_filter(
        [jnp.asarray(w) for w in words], 1, 65535, block_rows=2
    )
    cnt = np.asarray(got_cnt)
    keep = np.asarray(got_keep)
    assert cnt[0] == n
    assert keep[0]
    assert cnt[1:].sum() == 0


def test_all_valid_no_sentinel():
    # No sentinel tail at all: the final run must end at n.
    n = 512
    words = [np.sort(np.random.default_rng(3).integers(
        0, 50, size=n).astype(np.uint32))]
    want_cnt, want_keep = _xla_reference(words, 1, 65535)
    got_cnt, got_keep = pallas_count.run_length_count_filter(
        [jnp.asarray(w) for w in words], 1, 65535, block_rows=2
    )
    assert np.array_equal(np.asarray(got_cnt), want_cnt)
    assert np.array_equal(np.asarray(got_keep), np.asarray(want_keep))


def test_pipeline_with_fused_count():
    from hysortk_tpu import KmerConfig, count_reads
    from hysortk_tpu.io import fasta as fasta_io
    from hysortk_tpu import testing as oracle

    rng = np.random.default_rng(91)
    reads = oracle.random_reads(rng, 25, 35, 90)
    reads = reads + reads[:10]
    codes, lengths = fasta_io.reads_to_codes(reads)
    cfg = KmerConfig(k=31, m=17, lower=2, upper=50, fuse_count=True,
                     pad_multiple=256)
    got, hist = count_reads(codes, lengths, cfg)
    cfg0 = KmerConfig(k=31, m=17, lower=2, upper=50, pad_multiple=256)
    want, hist0 = count_reads(codes, lengths, cfg0)
    assert got.as_dict() == want.as_dict()
    assert np.array_equal(hist, hist0)


@pytest.mark.parametrize("n_words", [1, 2, 3])
@pytest.mark.parametrize("invalid_frac", [0.0, 0.3])
def test_weighted_sum_matches_xla(n_words, invalid_frac):
    """run_length_sum_fused == the XLA weighted formulation, including
    sentinel tails and runs spanning block boundaries."""
    rng = np.random.default_rng(n_words * 100 + int(invalid_frac * 10))
    n = 1024
    words = _make_sorted(rng, n, n_words, 60, invalid_frac)
    weights = rng.integers(1, 9, size=n).astype(np.uint32)
    words_j = [jnp.asarray(w) for w in words]
    svalid = sort_ops.sentinel_valid(words_j)
    want_head, want_cnt = count_ops.run_length_sum(
        svalid, words_j, jnp.asarray(weights.astype(np.int32))
    )
    got_head, got_cnt = pallas_count.run_length_sum_fused(
        words_j, jnp.asarray(weights), block_rows=2
    )
    assert np.array_equal(np.asarray(got_head), np.asarray(want_head))
    assert np.array_equal(np.asarray(got_cnt), np.asarray(want_cnt))


def test_weighted_sum_run_spanning_whole_block():
    """A single run covering entire interior blocks exercises the
    no-boundary-in-block carry path."""
    n = 1024
    w0 = np.full(n, 7, np.uint32)
    w0[:3] = 1
    w0[-128:] = FULL  # sentinel tail
    weights = np.arange(1, n + 1, dtype=np.uint32) % 5 + 1
    words_j = [jnp.asarray(w0)]
    svalid = sort_ops.sentinel_valid(words_j)
    want_head, want_cnt = count_ops.run_length_sum(
        svalid, words_j, jnp.asarray(weights.astype(np.int32))
    )
    got_head, got_cnt = pallas_count.run_length_sum_fused(
        words_j, jnp.asarray(weights), block_rows=2
    )
    assert np.array_equal(np.asarray(got_head), np.asarray(want_head))
    assert np.array_equal(np.asarray(got_cnt), np.asarray(want_cnt))
