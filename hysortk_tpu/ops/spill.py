"""Exact-capacity geometry for the range exchange.

The range exchange's receive-side merge needs pow2 x pow2 geometry
(ops/merge.py), but the per-(src,dst) segment mean is itself a power of
two whenever the batch is (production batches snap to pow2 flats), so ANY
headroom used to round the slot capacity up to the next power of two —
the old `next_pow2(capacity_factor * mean)` rule — made every receive-side
merge, count, and all_to_all process 2x n_local elements.

Instead each exchange cell carries `capacity = m + sc` contiguous elements
of the segment, where m = next_pow2(mean) holds the bulk and a small
spill lane sc >> fluctuation absorbs the hash-uniform overhang
(sigma ~ sqrt(n/S) keys). The wire and the main merge stay 1x; the spill
tails are lax.sort'ed flat (tiny), sentinel-padded, and folded into the
plane by ONE extra top-level bitonic merge level
(parallel/pipeline._range_exchange_merge).

History: the first round-4 protocol folded spill counts into the 1x plane
by a vectorized lexicographic binary search + scatter-add here, with a
"leftover" side channel for keys whose every copy spilled. Chip-measured
(tools/bench_spill_merge.py, 2^26/S=8): 1329.6 ms vs 331.9 for even the
legacy 2x merge — ~27 rounds of random gathers at 82M elem/s swamp
everything. The merge-level fold replaced it: gather-based search is
never the answer on this hardware, comparison networks are.

The reference avoids the problem with exact receive preallocation
(src/kmerops.cpp:439-471) — possible there because MPI ranks exchange
byte counts first; XLA collectives need static shapes, so the exactness
moves into the static geometry + spill lane.
"""

from __future__ import annotations



def split_capacity(capacity: int) -> tuple[int, int]:
    """capacity -> (m, sc): m = largest power of two <= capacity.

    sc == 0 (capacity itself pow2) selects the legacy single-plane
    geometry — EXT mode and the overflow-retry doubling both preserve the
    invariant (m + sc doubles to 2m + 2sc with 2m still the largest pow2).
    """
    m = 1 << (int(capacity).bit_length() - 1)
    return m, capacity - m
