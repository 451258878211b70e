"""Pallas hybrid sort vs numpy lexsort (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hysortk_tpu.ops import pallas_sort

pallas_sort.set_interpret(True)

FULL = np.uint32(0xFFFFFFFF)


def _ref_sort(words, payloads):
    """numpy: lexsort by (w0, w1, ...) with payloads carried."""
    order = np.lexsort(tuple(reversed([w for w in words])))
    return [w[order] for w in words], [p[order] for p in payloads]


def _run(words, payloads=(), block_rows=2, fuse_bits=2):
    got_w, got_p = pallas_sort.sort_words(
        [jnp.asarray(w) for w in words],
        [jnp.asarray(p) for p in payloads],
        block_rows=block_rows,
        fuse_bits=fuse_bits,
    )
    return [np.asarray(w) for w in got_w], [np.asarray(p) for p in got_p]


def _check_sorted_equal(got_w, want_w):
    for g, w in zip(got_w, want_w):
        assert np.array_equal(g, w)


@pytest.mark.parametrize("n", [256, 512, 1024, 2048])
def test_single_word_sorted(n):
    rng = np.random.default_rng(n)
    w0 = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    got_w, _ = _run([w0], [])
    want = np.sort(w0)
    assert np.array_equal(got_w[0], want)


def test_two_word_lexicographic():
    rng = np.random.default_rng(5)
    n = 1024
    # Few distinct w0 values force heavy w1 tie-breaking.
    w0 = rng.integers(0, 4, size=n, dtype=np.uint32)
    w1 = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    got_w, _ = _run([w0, w1])
    want_w, _ = _ref_sort([w0, w1], [])
    _check_sorted_equal(got_w, want_w)


def test_payload_follows_key():
    rng = np.random.default_rng(9)
    n = 512
    w0 = rng.permutation(n).astype(np.uint32)  # unique keys
    pay = (w0 * 7 + 1).astype(np.uint32)  # payload determined by key
    got_w, got_p = _run([w0], [pay])
    assert np.array_equal(got_w[0], np.sort(w0))
    assert np.array_equal(got_p[0], np.sort(w0) * 7 + 1)


def test_non_power_of_two_padding():
    rng = np.random.default_rng(3)
    n = 700  # forces sentinel padding to 1024
    w0 = rng.integers(0, 1 << 31, size=n, dtype=np.uint32)
    got_w, _ = _run([w0], [])
    assert got_w[0].shape[0] == n
    assert np.array_equal(got_w[0], np.sort(w0))


def test_sentinel_stays_last():
    rng = np.random.default_rng(11)
    n = 512
    w0 = rng.integers(0, 1 << 20, size=n, dtype=np.uint32)
    w1 = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    invalid = rng.random(n) < 0.3
    w0[invalid] = FULL
    w1[invalid] = FULL
    got_w, _ = _run([w0, w1])
    n_valid = int((~invalid).sum())
    # All sentinels at the tail.
    assert np.all(got_w[0][n_valid:] == FULL)
    assert np.all(got_w[1][n_valid:] == FULL)
    want_w, _ = _ref_sort([w0, w1], [])
    _check_sorted_equal(got_w, want_w)


def test_multi_block_merge_levels():
    # block_rows=2 -> B=256; n=2048 -> 8 blocks -> 3 merge levels.
    rng = np.random.default_rng(13)
    n = 2048
    w0 = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    w1 = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    got_w, _ = _run([w0, w1], block_rows=2, fuse_bits=2)
    want_w, _ = _ref_sort([w0, w1], [])
    _check_sorted_equal(got_w, want_w)


def test_duplicates_grouped():
    rng = np.random.default_rng(17)
    n = 1024
    w0 = rng.integers(0, 8, size=n, dtype=np.uint32)
    w1 = rng.integers(0, 8, size=n, dtype=np.uint32)
    got_w, _ = _run([w0, w1])
    want_w, _ = _ref_sort([w0, w1], [])
    _check_sorted_equal(got_w, want_w)


def test_merge_runs_pallas():
    """Pallas merge-level entry at 2L (the TPU merge backend for the range
    exchange) matches a full sort, payloads riding."""
    import numpy as np
    import jax.numpy as jnp

    from hysortk_tpu.ops import pallas_sort

    rng = np.random.default_rng(55)
    run_len = 2048
    s = 4
    n = s * run_len
    w0 = rng.integers(0, 97, n).astype(np.uint32)
    w1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    pay = np.arange(n, dtype=np.uint32)
    # sentinel tails + sorted runs
    for r in range(s):
        pad = int(rng.integers(0, run_len // 4))
        if pad:
            w0[(r + 1) * run_len - pad : (r + 1) * run_len] = 0xFFFFFFFF
            w1[(r + 1) * run_len - pad : (r + 1) * run_len] = 0xFFFFFFFF
        sl = slice(r * run_len, (r + 1) * run_len)
        order = np.lexsort((w1[sl], w0[sl]))
        w0[sl], w1[sl], pay[sl] = w0[sl][order], w1[sl][order], pay[sl][order]

    prev = pallas_sort._INTERPRET
    pallas_sort.set_interpret(True)
    try:
        m0, m1, mp = pallas_sort.merge_runs(
            [jnp.asarray(w0), jnp.asarray(w1), jnp.asarray(pay)],
            2, run_len, block_rows=8,
        )
    finally:
        pallas_sort.set_interpret(prev)
    order = np.lexsort((w1, w0))
    assert np.array_equal(np.asarray(m0), w0[order])
    assert np.array_equal(np.asarray(m1), w1[order])
    got = sorted(zip(np.asarray(m0).tolist(), np.asarray(m1).tolist(),
                     np.asarray(mp).tolist()))
    exp = sorted(zip(w0.tolist(), w1.tolist(), pay.tolist()))
    assert got == exp


def test_cap_fuse_bits_scoped_vmem_budget():
    """Chip-measured scoped-vmem is ~2.3-2.7x the cross-kernel scratch; the
    cap must keep the 2-array 512-row production config at f=3 while
    dropping 3-array merges (keys + count) below the geometry that OOMed
    scoped VMEM on hardware (f=3, 512 rows, 3 arrays -> 17.04 MiB)."""
    block = 512 * pallas_sort.LANES
    assert pallas_sort.cap_fuse_bits(4, block, 2) == 3
    assert pallas_sort.cap_fuse_bits(4, block, 3) == 2
    # Small geometries keep the requested width.
    assert pallas_sort.cap_fuse_bits(4, 16 * pallas_sort.LANES, 3) == 4
    # Never below 1 even when a single block pair exceeds the budget.
    assert pallas_sort.cap_fuse_bits(4, 4096 * pallas_sort.LANES, 8) == 1
