"""Spill-lane fold for the exact-capacity range exchange.

The range exchange's receive-side merge needs pow2 x pow2 geometry
(ops/merge.py), but the per-(src,dst) segment mean is itself a power of
two whenever the batch is (production batches snap to pow2 flats), so ANY
headroom used to round the slot capacity up to the next power of two —
the old `next_pow2(capacity_factor * mean)` rule — made every receive-side
merge, count, and all_to_all process 2x n_local elements.

Instead each exchange cell now carries `capacity = m + sc` contiguous
elements of the segment, where m = next_pow2(mean) holds the bulk and a
small spill lane sc >> fluctuation absorbs the hash-uniform overhang
(sigma ~ sqrt(n/S) keys). The receive side merges ONLY the (S, m) main
plane through the pow2 network; the (S, sc) spill plane is lax.sort'ed
flat (tiny) and its run counts are folded into the main counts here:
a vectorized lexicographic binary search finds each distinct spill key's
head slot in the merged plane, a scatter-add lands its count, and keys
whose every copy landed in spill lanes (possible: the spill is each
segment's top-of-range tail, and a globally-rare key can sit in that tail
for every sender) come back as a tiny sorted leftover partial.

The reference avoids the problem with exact receive preallocation
(src/kmerops.cpp:439-471) — possible there because MPI ranks exchange
byte counts first; XLA collectives need static shapes, so the exactness
moves into the static geometry + spill protocol.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def split_capacity(capacity: int) -> tuple[int, int]:
    """capacity -> (m, sc): m = largest power of two <= capacity.

    sc == 0 (capacity itself pow2) selects the legacy single-plane
    geometry — EXT mode and the overflow-retry doubling both preserve the
    invariant (m + sc doubles to 2m + 2sc with 2m still the largest pow2).
    """
    m = 1 << (int(capacity).bit_length() - 1)
    return m, capacity - m


def lex_searchsorted(
    table_words: Sequence[jnp.ndarray], query_words: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """First index i with table[i] >= query, lexicographic over word lists.

    Both sides ascending-sorted uint32 word tuples (sentinel 0xFFFFFFFF
    tails sort last, so real queries always land before them). A dense
    vectorized binary search: log2(n) iterations of one gather per word
    over all queries at once — for the spill fold that is ~27 iterations
    x |spill| gathers, microseconds at the 2^16 spill scale (a full
    merge-network fold of the spill into the 2^26 main plane would cost a
    whole extra merge level over the padded pair — the very inflation this
    module removes).
    """
    n = int(table_words[0].shape[0])
    nq = query_words[0].shape[0]
    steps = max(n.bit_length(), 1)
    lo = jnp.zeros(nq, jnp.int32)
    hi = jnp.full(nq, n, jnp.int32)

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) >> 1
        midc = jnp.minimum(mid, n - 1)
        less = jnp.zeros(nq, jnp.bool_)
        eq = jnp.ones(nq, jnp.bool_)
        for tw, qw in zip(table_words, query_words):
            t = tw[midc]
            less = less | (eq & (t < qw))
            eq = eq & (t == qw)
        active = lo < hi
        lo2 = jnp.where(active & less, mid + 1, lo)
        hi2 = jnp.where(active & ~less, mid, hi)
        return lo2, hi2

    lo, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def fold_spill_counts(
    merged_words: Sequence[jnp.ndarray],
    cnt: jnp.ndarray,
    spill_words: Sequence[jnp.ndarray],
    spill_head: jnp.ndarray,
    spill_cnt: jnp.ndarray,
    lower: int,
    upper: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fold spill-lane run counts into the merged plane's counts.

    merged_words: sorted sentinel-marked main plane (length T).
    cnt: dense per-slot run counts of the main plane (>0 exactly at run
    heads of valid keys).
    spill_words/spill_head/spill_cnt: the sorted spill plane with its own
    run heads and (possibly weight-summed) run counts.

    Returns (cnt2, keep2, leftover_cnt, leftover_keep):
      cnt2/keep2: main plane counts with spill contributions added and the
        [lower, upper] filter re-applied.
      leftover_cnt/leftover_keep: dense over the spill plane — nonzero
        only at heads of spill keys ABSENT from the main plane, filtered
        by the same bounds (complete counts: absence from the local merge
        means no copy of the key went to any sender's main lane, and this
        shard's merge holds every main-lane copy of its key range).
    """
    n = merged_words[0].shape[0]
    pos = lex_searchsorted(merged_words, spill_words)
    posc = jnp.minimum(pos, n - 1)
    eq = jnp.ones(pos.shape, jnp.bool_)
    for mw, xw in zip(merged_words, spill_words):
        eq = eq & (mw[posc] == xw)
    found = spill_head & eq

    cnt2 = cnt.at[posc].add(jnp.where(found, spill_cnt, 0))
    lo = max(int(lower), 1)
    keep2 = (cnt2 >= lo) & (cnt2 <= upper)

    leftover_cnt = jnp.where(spill_head & ~eq, spill_cnt, 0)
    leftover_keep = (leftover_cnt >= lo) & (leftover_cnt <= upper)
    return cnt2, keep2, leftover_cnt, leftover_keep
