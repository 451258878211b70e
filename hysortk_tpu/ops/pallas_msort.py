"""Member-layout bitonic block sort: phase A/tails with cheap row-group stages.

Round-3 redesign of the in-VMEM parts of ops/pallas_sort.py, motivated by the
round-2 measurement that phase A is COMPUTE-bound (131 ms of 289 at 2^26 —
CLAUDE.md ledger): every compare-exchange stage there fetches its partner with
two circular rolls, and rolls (Mosaic relayouts) dominate the stage cost.

The fix exploits that a compare-exchange at stride j only needs element i^j:
when the stride bit lives in the ROW-GROUP part of the index (row bits >= 3,
i.e. whole (8,128) vreg tiles), the partner is a *layout-preserving static
slice* — view the (R, 128) block as (G, 2, Rb, 128), compare v[:,0] with
v[:,1] elementwise, and stack back. No rolls, no relayouts: reshapes that
split only the row dimension at multiples of 8 keep vreg boundaries intact.
Only row bits 0..2 (sublane rolls) and the 7 lane bits still pay rolls.

Because low strides repeat most in a bitonic sort (stride 2^s occurs
log2(B)-s times), every kernel here works in a BIT-PERMUTED layout that puts
logical bits 0..4 on the row-group axis (free), 5..7 on sublanes, 8..14 on
lanes:

    physical slot (r, c) holds logical element
        i = (r >> 3) | ((r & 7) << 5) | (c << 8)

With B = 2^15 that makes 65 of phase A's 120 stages roll-free and shrinks
every remaining roll distance.

Crucially the permutation is block-local and identical in every block, so the
ENTIRE sort runs in permuted layout: cross-block merge strides (j >= B) pair
identical intra-block offsets — pallas_sort._cross_kernel is elementwise
between blocks and needs no change — and the per-level tails use the same
permuted map (_tail_member_kernel). Mosaic cannot lower the in-kernel
un-permute ((32,8,128) transpose = "unsupported shape cast"), so the single
physical-order restore is ONE XLA transpose after the last merge level
(unpermute_blocks) — ~2 HBM passes per array, microseconds next to the sort.

Reference role: PARADIS/RADULS (dependency/Paradis/paradissort.hpp,
dependency/Raduls/raduls.h:349-546) — the reference's CPU radix sorts; on TPU
comparison networks are the correct architecture (radix scatter measured
dead, CLAUDE.md) and this module is about minimizing per-stage vector cost.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_sort
from .pallas_sort import LANES, _lex_less_eq, _roll

_FULL32 = np.uint32(0xFFFFFFFF)

# Fixed geometry: B = 2^15 elements per block as (256, 128).
BLOCK_ROWS = 256
BLOCK = BLOCK_ROWS * LANES  # 32768
_LOG_B = 15


# ---------------------------------------------------------------------------
# Layout: logical <-> physical (XLA-level, outside kernels).
# ---------------------------------------------------------------------------


def permute_blocks(a: jnp.ndarray) -> jnp.ndarray:
    """Physical order -> permuted layout, block-locally (1-D, n % BLOCK == 0).

    After this, physical slot (r, c) of each block holds the element whose
    physical index within the block was (r >> 3) | ((r & 7) << 5) | (c << 8).
    """
    n = a.shape[0]
    return (
        a.reshape(n // BLOCK, LANES, 8, 32)
        .transpose(0, 3, 2, 1)
        .reshape(n)
    )


def unpermute_blocks(a: jnp.ndarray) -> jnp.ndarray:
    """Permuted layout -> physical order; exact inverse of permute_blocks."""
    n = a.shape[0]
    return (
        a.reshape(n // BLOCK, 32, 8, LANES)
        .transpose(0, 3, 2, 1)
        .reshape(n)
    )


# ---------------------------------------------------------------------------
# In-kernel building blocks.
# ---------------------------------------------------------------------------


def _partner2(x: jnp.ndarray, axis: int, q: int) -> jnp.ndarray:
    """Value at index (coord ^ q) along `axis` of a (R, 128) array."""
    bit = (jax.lax.broadcasted_iota(jnp.int32, x.shape, axis) & q) != 0
    return jnp.where(bit, _roll(x, q, axis), _roll(x, -q, axis))


def _cex_roll(arrs, n_words, axis, q, take_min):
    """Compare-exchange where the stride bit lives on a rolled axis.

    take_min: (R, 128) bool — positions whose pair-minimum they keep
    (bit_k(i) == bit_j(i), the global bitonic direction rule).
    """
    partners = [_partner2(a, axis, q) for a in arrs]
    less, eq = _lex_less_eq(arrs[:n_words], partners[:n_words])
    greater = ~(less | eq)
    swap = (take_min & greater) | (~take_min & less)
    return [jnp.where(swap, p, a) for a, p in zip(arrs, partners)]


def _cex_rowgroup(arrs, n_words, rb: int, take_min_lo):
    """Compare-exchange where the stride bit is row bit log2(rb) >= 3.

    Partner pairs are contiguous row groups of rb rows: view (R, 128) as
    (G, 2, rb, 128) — two static slices, elementwise compare, stack back.
    Layout-preserving (rb >= 8 keeps vreg rows intact): no rolls at all.

    take_min_lo: direction mask already sliced to the lo-half geometry
    (G, rb, 128) — the lo half has bit_j = 0, so take_min = (bit_k == 0).
    """
    R = arrs[0].shape[0]
    g = R // (2 * rb)
    views = [a.reshape(g, 2, rb, LANES) for a in arrs]
    lo = [v[:, 0] for v in views]
    hi = [v[:, 1] for v in views]
    less, eq = _lex_less_eq(hi[:n_words], lo[:n_words])
    greater = ~(less | eq)  # hi > lo
    swap = (take_min_lo & less) | (~take_min_lo & greater)
    out = []
    for l, h in zip(lo, hi):
        new_lo = jnp.where(swap, h, l)
        new_hi = jnp.where(swap, l, h)
        out.append(
            jnp.stack([new_lo, new_hi], axis=1).reshape(R, LANES)
        )
    return out


def _bit(i_log: jnp.ndarray, p):
    """(i_log >> p) & 1 as a bool array; p may be a python int or traced."""
    return ((i_log >> p) & 1) == 1


def _rowgroup_mask(take_min_full, rb: int):
    """Slice a full (R,128) direction mask to the lo-half (G, rb, 128)."""
    R = take_min_full.shape[0]
    g = R // (2 * rb)
    return take_min_full.reshape(g, 2, rb, LANES)[:, 0]


def _ilog(beta):
    """Logical element index at each physical slot, permuted map + block
    offset. Logical bits 0..4 -> row bits 3..7, 5..7 -> row bits 0..2,
    8..14 -> lane bits."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 1)
    i = (rows >> 3) | ((rows & 7) << 5) | (cols << 8)
    return i + beta * BLOCK


def _stage(arrs, n_words, s: int, bit_k, i_log):
    """One compare-exchange at logical stride 2^s in the permuted layout.

    bit_k: (R,128) bool — bit of the enclosing region size k at each slot;
    constant across each stride-2^s pair because k > 2^s always.
    """
    if s < 5:
        take_min_lo = _rowgroup_mask(~bit_k, 8 << s)
        return _cex_rowgroup(arrs, n_words, 8 << s, take_min_lo)
    take_min = bit_k == _bit(i_log, s)
    if s < 8:
        return _cex_roll(arrs, n_words, 0, 1 << (s - 5), take_min)
    return _cex_roll(arrs, n_words, 1, 1 << (s - 8), take_min)


# ---------------------------------------------------------------------------
# Phase A: full bitonic sort of each block, permuted in AND out.
# ---------------------------------------------------------------------------


def _block_sort_member_kernel(n_arrays: int, n_words: int):
    def kernel(*refs):
        ins, outs = refs[:n_arrays], refs[n_arrays:]
        arrs = [r[:] for r in ins]
        beta = pl.program_id(0)
        i_log = _ilog(beta)
        k = 2
        while k <= BLOCK:
            bit_k = _bit(i_log, int(k).bit_length() - 1)
            j = k // 2
            while j >= 1:
                s = int(j).bit_length() - 1
                arrs = _stage(arrs, n_words, s, bit_k, i_log)
                j //= 2
            k *= 2
        for o, a in zip(outs, arrs):
            o[:] = a

    return kernel


def block_sort_member(
    arrays: Sequence[jnp.ndarray], n_words: int
) -> list[jnp.ndarray]:
    """Sort each 32768-element block in LOGICAL (permuted-layout) order;
    blocks alternate asc/desc (the orientation merge_levels expects).

    Input order is arbitrary (phase A sorts), so no input permute is needed:
    the physical slots are simply *read* as the permuted map. The output
    stays in permuted layout — run merge levels with tail="member", then
    unpermute_blocks once at the end.
    """
    n = arrays[0].shape[0]
    assert n % BLOCK == 0, n
    n_blocks = n // BLOCK
    arrs2d = [a.reshape(n // LANES, LANES) for a in arrays]
    spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _block_sort_member_kernel(len(arrays), n_words),
        grid=(n_blocks,),
        in_specs=[spec] * len(arrays),
        out_specs=[spec] * len(arrays),
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs2d],
        interpret=pallas_sort._INTERPRET,
    )(*arrs2d)
    return [o.reshape(n) for o in out]


# ---------------------------------------------------------------------------
# Tail: strides B/2 .. 1 of one merge level, permuted layout throughout.
# ---------------------------------------------------------------------------


def _tail_member_kernel(n_arrays: int, n_words: int):
    """k-bit position arrives via scalar prefetch: one compile serves all
    merge levels (same contract as pallas_sort._tail_kernel). Operates on
    blocks in permuted layout; k >= 2B means bit_k depends only on the block
    index, so it is insensitive to the intra-block permutation."""

    def kernel(params_ref, *refs):
        k_bitpos = params_ref[0]
        ins, outs = refs[:n_arrays], refs[n_arrays:]
        arrs = [r[:] for r in ins]
        beta = pl.program_id(0)
        i_log = _ilog(beta)
        bit_k = _bit(i_log, k_bitpos)
        for s in range(_LOG_B - 1, -1, -1):  # j = B/2 .. 1
            arrs = _stage(arrs, n_words, s, bit_k, i_log)
        for o, a in zip(outs, arrs):
            o[:] = a

    return kernel
