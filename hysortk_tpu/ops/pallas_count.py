"""Fused run-length count + [L,U] filter as one Pallas kernel.

ops/count.py expresses the count as ~10 separate XLA passes (rolled
inequality, cummin, cumsum, masks). This kernel does the whole thing in one
sweep over the sorted keys: blocks are processed RIGHT to LEFT (pallas grid
steps run sequentially on TPU), each block computes its run boundaries and
an in-block suffix-minimum of boundary positions by doubling shifted-mins,
and a single SMEM scalar carries "position of the first boundary at or after
this block's end" across grid steps — the cross-block part of the scan.

Key detail vs ops/count.run_length_count: run *boundaries* here include the
first sentinel slot (a sentinel differs from the last real key), so a run's
extent is (next boundary) - (own position) with no extra valid-count clamp,
and the logic is robust even to interior sentinel gaps.

Semantics verified against the XLA implementation in tests.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sort import LANES, _roll, _logical_index
from . import pallas_sort

_FULL = np.uint32(0xFFFFFFFF)
_INT_MAX = np.int32(2**31 - 1)


def _shift_back(x, t):
    """shifted[i] = x[i - t] over the row-major (R,128) view (t in [1,128))."""
    bwd = _roll(x, t, 1)
    bwd_prev = _roll(bwd, 1, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col >= t, bwd, bwd_prev)


def _shift_fwd_fill(x, t, fill):
    """shifted[i] = x[i + t] with `fill` beyond the block end (t < B)."""
    B = x.shape[0] * LANES
    if t < LANES:
        fwd = _roll(x, -t, 1)
        fwd_next = _roll(fwd, -1, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        y = jnp.where(col < LANES - t, fwd, fwd_next)
    else:
        q = t // LANES
        r = t % LANES
        y = _roll(x, -q, 0)
        if r:
            fwd = _roll(y, -r, 1)
            fwd_next = _roll(fwd, -1, 0)
            col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            y = jnp.where(col < LANES - r, fwd, fwd_next)
    i_local = _logical_index(x.shape)
    return jnp.where(i_local < B - t, y, fill)


def _count_kernel(n_words: int, block_rows: int, lower: int, upper: int):
    R = block_rows
    B = R * LANES

    def kernel(*refs):
        word_refs = refs[:n_words]
        cnt_ref, keep_ref = refs[n_words : n_words + 2]
        halo_scratch = refs[n_words + 2 : 2 * n_words + 2]
        carry_ref = refs[2 * n_words + 2]  # SMEM (1,)
        sems = refs[2 * n_words + 3]

        step = pl.program_id(0)
        n_blocks = pl.num_programs(0)
        b = n_blocks - 1 - step  # process right to left

        @pl.when(step == 0)
        def _():
            # "No boundary after" = end of data.
            carry_ref[0] = n_blocks * B

        # Left halo: the 8 rows before this block (clamped at the front; the
        # affected element, global position 0, is forced a boundary anyway).
        halo_start = jnp.maximum(b * R - 8, 0)
        off = b * R - halo_start  # 8 normally, 0 for the first block
        for x in range(n_words):
            pltpu.make_async_copy(
                word_refs[x].at[pl.ds(halo_start, R + 8), :],
                halo_scratch[x],
                sems.at[x],
            ).start()
        for x in range(n_words):
            pltpu.make_async_copy(
                word_refs[x].at[pl.ds(halo_start, R + 8), :],
                halo_scratch[x],
                sems.at[x],
            ).wait()

        words = [s[pl.ds(off, R), :] for s in halo_scratch]
        i_global = _logical_index(words[0].shape) + b * B
        row0 = jax.lax.broadcasted_iota(jnp.int32, words[0].shape, 0) == 0
        col0 = jax.lax.broadcasted_iota(jnp.int32, words[0].shape, 1) == 0
        first_slot = row0 & col0

        # Run boundaries: first slot of every distinct key (sentinels form
        # their own runs, terminating the last real run).
        neq = jnp.zeros(words[0].shape, dtype=jnp.bool_)
        for x in range(n_words):
            w = words[x].astype(jnp.uint32)
            prev = _shift_back(w, 1)
            # Patch the block's first element: its left neighbor lives at the
            # end of the halo (scratch row off-1 ... i.e. 7 when off == 8).
            halo_last = halo_scratch[x][jnp.maximum(off - 1, 0), LANES - 1]
            prev = jnp.where(first_slot, halo_last, prev)
            neq = neq | (w != prev)
        boundary = neq | (i_global == 0)

        # In-block suffix-min of boundary positions (exclusive of self).
        bpos = jnp.where(boundary, i_global, _INT_MAX)
        nxt = _shift_fwd_fill(bpos, 1, _INT_MAX)
        t = 1
        while t < B:
            nxt = jnp.minimum(nxt, _shift_fwd_fill(nxt, t, _INT_MAX))
            t *= 2
        nxt = jnp.minimum(nxt, carry_ref[0])

        cnt = jnp.where(boundary, nxt - i_global, 0)
        valid = jnp.ones(words[0].shape, dtype=jnp.bool_)
        for x in range(n_words):
            valid = valid & (words[x].astype(jnp.uint32) == _FULL)
        valid = ~valid  # not all-ones sentinel
        head = boundary & valid
        cnt = jnp.where(head, cnt, 0)
        keep = head & (cnt >= lower) & (cnt <= upper)

        cnt_ref[:] = cnt
        keep_ref[:] = keep.astype(jnp.uint32)

        # New carry: first boundary at or after this block's start.
        block_min = jnp.min(bpos)
        carry_ref[0] = jnp.minimum(block_min, carry_ref[0])

    return kernel


def run_length_count_filter(
    sorted_words: Sequence[jnp.ndarray],
    lower: int,
    upper: int,
    block_rows: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sentinel-marked sorted words -> (cnt int32, keep bool), fused.

    Input length must be a multiple of 128; it is padded to the block size
    with the sentinel (which only adds sentinel runs).
    """
    n_words = len(sorted_words)
    n = sorted_words[0].shape[0]
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    arrs = []
    for w in sorted_words:
        w = w.astype(jnp.uint32)
        # Sentinel-pad to the block size, plus 8 trailing rows so the
        # clamped-halo DMA (R+8 rows) never overruns the array.
        w = jnp.concatenate(
            [w, jnp.full((n_pad - n + 8 * LANES,), _FULL, dtype=jnp.uint32)]
        )
        arrs.append(w.reshape(-1, LANES))
    n_blocks = n_pad // block

    out_spec = pl.BlockSpec(
        (block_rows, LANES),
        lambda s, nb=n_blocks: (nb - 1 - s, 0),
        memory_space=pltpu.VMEM,
    )
    cnt, keep = pl.pallas_call(
        _count_kernel(n_words, block_rows, lower, upper),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_words,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_rows + 8, LANES), jnp.uint32)
            for _ in range(n_words)
        ]
        + [pltpu.SMEM((1,), jnp.int32), pltpu.SemaphoreType.DMA((n_words,))],
        interpret=pallas_sort._INTERPRET,
    )(*arrs)
    return (
        cnt.reshape(n_pad)[:n],
        (keep.reshape(n_pad)[:n]).astype(jnp.bool_),
    )


def _sum_kernel(n_words: int, block_rows: int):
    """Weighted variant of _count_kernel: each slot contributes its weight
    to its run's total (the consolidation/final-merge reducer — reference
    count_sorted_kmerlist, src/kmerops.cpp:1447-1476). Same right-to-left
    grid; the SMEM carry grows to (first-boundary-pos, suffix-sum-at-it,
    total-weight-right-of-block)."""
    R = block_rows
    B = R * LANES

    def kernel(*refs):
        word_refs = refs[:n_words]
        w_ref = refs[n_words]
        cnt_ref, head_ref = refs[n_words + 1 : n_words + 3]
        halo_scratch = refs[n_words + 3 : 2 * n_words + 3]
        carry_ref = refs[2 * n_words + 3]  # SMEM (3,): pos, S_at_pos, total
        sems = refs[2 * n_words + 4]

        step = pl.program_id(0)
        n_blocks = pl.num_programs(0)
        b = n_blocks - 1 - step  # right to left

        @pl.when(step == 0)
        def _():
            carry_ref[0] = n_blocks * B  # no boundary after the end
            carry_ref[1] = 0  # suffix sum there
            carry_ref[2] = 0  # nothing to the right yet

        halo_start = jnp.maximum(b * R - 8, 0)
        off = b * R - halo_start
        for x in range(n_words):
            pltpu.make_async_copy(
                word_refs[x].at[pl.ds(halo_start, R + 8), :],
                halo_scratch[x],
                sems.at[x],
            ).start()
        for x in range(n_words):
            pltpu.make_async_copy(
                word_refs[x].at[pl.ds(halo_start, R + 8), :],
                halo_scratch[x],
                sems.at[x],
            ).wait()

        words = [s[pl.ds(off, R), :] for s in halo_scratch]
        i_global = _logical_index(words[0].shape) + b * B
        row0 = jax.lax.broadcasted_iota(jnp.int32, words[0].shape, 0) == 0
        col0 = jax.lax.broadcasted_iota(jnp.int32, words[0].shape, 1) == 0
        first_slot = row0 & col0

        neq = jnp.zeros(words[0].shape, dtype=jnp.bool_)
        for x in range(n_words):
            w = words[x].astype(jnp.uint32)
            prev = _shift_back(w, 1)
            halo_last = halo_scratch[x][jnp.maximum(off - 1, 0), LANES - 1]
            prev = jnp.where(first_slot, halo_last, prev)
            neq = neq | (w != prev)
        boundary = neq | (i_global == 0)

        sentinel = jnp.ones(words[0].shape, dtype=jnp.bool_)
        for x in range(n_words):
            sentinel = sentinel & (words[x].astype(jnp.uint32) == _FULL)
        valid = ~sentinel
        head = boundary & valid

        # Block-local inclusive suffix sum of weights, then globalize with
        # the carried right-of-block total.
        wts = jnp.where(valid, w_ref[:].astype(jnp.int32), 0)
        s = wts
        t = 1
        while t < B:
            s = s + _shift_fwd_fill(s, t, 0)
            t *= 2
        s_global = s + carry_ref[2]

        # Nearest boundary strictly after i, with the suffix sum AT it:
        # min-doubling over positions, payload selected alongside.
        bpos = jnp.where(boundary, i_global, _INT_MAX)
        bval = jnp.where(boundary, s_global, 0)
        nxt_p = _shift_fwd_fill(bpos, 1, _INT_MAX)
        nxt_v = _shift_fwd_fill(bval, 1, 0)
        t = 1
        while t < B:
            cand_p = _shift_fwd_fill(nxt_p, t, _INT_MAX)
            cand_v = _shift_fwd_fill(nxt_v, t, 0)
            take = cand_p < nxt_p
            nxt_p = jnp.where(take, cand_p, nxt_p)
            nxt_v = jnp.where(take, cand_v, nxt_v)
            t *= 2
        from_carry = carry_ref[0] < nxt_p
        nxt_v = jnp.where(from_carry, carry_ref[1], nxt_v)

        # Run total = suffix sum at my head minus suffix sum at next head.
        cnt = jnp.where(head, s_global - nxt_v, 0)
        cnt_ref[:] = cnt
        head_ref[:] = head.astype(jnp.uint32)

        # Carry update: first boundary at/after this block's start (+ its
        # suffix sum), and the new right-of-block weight total.
        block_min = jnp.min(bpos)
        block_min_v = jnp.max(jnp.where(bpos == block_min, bval, 0))
        take_block = block_min < carry_ref[0]
        carry_ref[0] = jnp.where(take_block, block_min, carry_ref[0])
        carry_ref[1] = jnp.where(take_block, block_min_v, carry_ref[1])
        carry_ref[2] = carry_ref[2] + jnp.sum(wts)

    return kernel


def run_length_sum_fused(
    sorted_words: Sequence[jnp.ndarray],
    weights: jnp.ndarray,
    block_rows: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sentinel-marked sorted words + per-slot weights -> (head bool,
    total int32): each distinct key's head slot carries the sum of its
    run's weights. One sweep over HBM; replaces the XLA formulation's
    cumsum + reverse cummin chain, which measured 6.8 s at 2^27 inside
    _merge_runs_sum (tools/diag_consolidate.py) vs ~0.1 s here.

    The [L, U] filter stays OUTSIDE (callers pass dynamic bounds)."""
    n_words = len(sorted_words)
    n = sorted_words[0].shape[0]
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    arrs = []
    for w in sorted_words:
        w = w.astype(jnp.uint32)
        w = jnp.concatenate(
            [w, jnp.full((n_pad - n + 8 * LANES,), _FULL, dtype=jnp.uint32)]
        )
        arrs.append(w.reshape(-1, LANES))
    wts = jnp.concatenate(
        [weights.astype(jnp.int32), jnp.zeros((n_pad - n,), jnp.int32)]
    ).reshape(-1, LANES)
    n_blocks = n_pad // block

    spec = pl.BlockSpec(
        (block_rows, LANES),
        lambda s, nb=n_blocks: (nb - 1 - s, 0),
        memory_space=pltpu.VMEM,
    )
    cnt, head = pl.pallas_call(
        _sum_kernel(n_words, block_rows),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_words + [spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_rows + 8, LANES), jnp.uint32)
            for _ in range(n_words)
        ]
        + [pltpu.SMEM((3,), jnp.int32), pltpu.SemaphoreType.DMA((n_words,))],
        interpret=pallas_sort._INTERPRET,
    )(*arrs, wts)
    return (
        (head.reshape(n_pad)[:n]).astype(jnp.bool_),
        cnt.reshape(n_pad)[:n],
    )
