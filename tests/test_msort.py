"""Member-tile Pallas sort (ops/pallas_msort.py) in interpret mode.

The production sort backend at n >= 2^23 (sort_decision): vreg-tile member
layout, tie-free compare-exchange for key-only sorts, exact-ties chains when
payloads ride along, fused cross+tail merge levels. Interpret mode clamps
block_rows to 16 (block 2048, log_b 11 — the smallest geometry where the
member formulation engages rather than falling back to roll)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hysortk_tpu.ops import pallas_sort


@pytest.fixture(autouse=True)
def _interpret():
    prev = pallas_sort._INTERPRET
    pallas_sort.set_interpret(True)
    yield
    pallas_sort.set_interpret(prev)


def test_member_sort_two_words_matches_lexsort():
    rng = np.random.default_rng(3)
    n = 3 * 2048 + 17  # forces padding to 4 blocks
    w0 = rng.integers(0, 7, n).astype(np.uint32)  # heavy ties
    w1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    got, _ = pallas_sort.sort_words(
        [jnp.asarray(w0), jnp.asarray(w1)], formulation="member"
    )
    order = np.lexsort((w1, w0))
    np.testing.assert_array_equal(np.asarray(got[0]), w0[order])
    np.testing.assert_array_equal(np.asarray(got[1]), w1[order])


def test_member_sort_payload_exact_ties():
    """With payloads, tie-swapping formulations would tear (key, payload)
    pairs apart; the exact-ties chain must keep every pair intact."""
    rng = np.random.default_rng(4)
    n = 2 * 2048
    w0 = rng.integers(0, 5, n).astype(np.uint32)  # almost all ties
    pay = np.arange(n, dtype=np.uint32)
    got_w, got_p = pallas_sort.sort_words(
        [jnp.asarray(w0)], [jnp.asarray(pay)], formulation="member"
    )
    pairs = sorted(zip(w0.tolist(), pay.tolist()))
    got_pairs = list(
        zip(np.asarray(got_w[0]).tolist(), np.asarray(got_p[0]).tolist())
    )
    # Unstable sort: equal keys may permute, but the multiset of
    # (key, payload) pairs must be exactly preserved and keys ascending.
    assert sorted(got_pairs) == pairs
    assert np.all(np.diff(np.asarray(got_w[0]).astype(np.int64)) >= 0)


def test_member_merge_runs():
    rng = np.random.default_rng(5)
    run_len = 2048
    s = 4
    n = s * run_len
    w0 = rng.integers(0, 2**32, n, dtype=np.uint32)
    for r in range(s):
        sl = slice(r * run_len, (r + 1) * run_len)
        w0[sl] = np.sort(w0[sl])
    got = pallas_sort.merge_runs(
        [jnp.asarray(w0)], 1, run_len, block_rows=16, formulation="member"
    )
    np.testing.assert_array_equal(np.asarray(got[0]), np.sort(w0))


def test_member_sort_mxu_partner_matches_roll(monkeypatch):
    """HYSORTK_MXU_PARTNER=1 fetches xor-partners via constant permutation
    matmuls (u16 planes, exact); results must be bit-identical to the roll
    formulation."""
    from hysortk_tpu.ops import pallas_msort

    rng = np.random.default_rng(11)
    n = 2 * 2048
    w0 = rng.integers(0, 2**32, n, dtype=np.uint32).astype(np.uint32)
    w1 = rng.integers(0, 2**32, n, dtype=np.uint32).astype(np.uint32)
    monkeypatch.setattr(pallas_msort, "_PARTNER", "mxu")
    got, _ = pallas_sort.sort_words(
        [jnp.asarray(w0), jnp.asarray(w1)], formulation="member"
    )
    order = np.lexsort((w1, w0))
    np.testing.assert_array_equal(np.asarray(got[0]), w0[order])
    np.testing.assert_array_equal(np.asarray(got[1]), w1[order])
