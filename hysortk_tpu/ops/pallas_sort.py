"""On-chip hybrid sort in Pallas: the TPU's answer to PARADIS/RADULS.

The reference spends most of its time in vendored CPU radix sorts
(dependency/Paradis, dependency/Raduls — SURVEY.md §2 #17-18). A radix
scatter is hostile to the TPU's (8,128) tiling, so this kernel family uses
comparison networks, which are pure dense vector ops:

  Phase A — block bitonic sort: the input, viewed as (rows, 128) row-major,
  is cut into VMEM-resident blocks of B = R*128 elements; a full bitonic
  network sorts each block. Every compare-exchange partner i^j is fetched
  with two circular rolls (lane rolls for j<128, sublane rolls for j>=128)
  and a bit-select — no gathers, no scatters, no data-dependent control flow.

  Phase B — merge-path merge levels: sorted runs are pairwise merged. A
  vectorized binary search (plain XLA, log(L) gathers over the run ends)
  finds, for every C-element output chunk, the exact split (merge path) of
  the two input runs; a Pallas kernel then DMAs the two <=C-element windows
  into VMEM, masks run overhang with the all-ones sentinel, flips the second
  window (an XOR-permutation, again just rolls), and runs the log(2C)-step
  bitonic merge. Each level costs ~one read+write pass over HBM — the log^2
  global-pass blowup of a plain bitonic sort over HBM never happens.

Keys are W uint32 words compared lexicographically; any number of payload
words ride along. Invalid slots must already carry the all-ones sentinel
(ops/sort.py), which sorts last and pads run overhang safely.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# numpy scalar (not jnp): inside kernels a jnp scalar would be a captured
# constant, which pallas_call rejects.
_FULL32 = np.uint32(0xFFFFFFFF)

# Interpret mode for CPU tests (set by tests via set_interpret()).
_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def _roll(x, shift, axis):
    """Circular roll that lowers on both Mosaic and the interpreter."""
    if _INTERPRET:
        return jnp.roll(x, shift, axis=axis)
    return pltpu.roll(x, shift, axis)


def _partner(x: jnp.ndarray, j: int) -> jnp.ndarray:
    """Value at row-major logical index i^j of a (R, 128) array."""
    rows = x.shape[0]
    if j >= LANES:
        q = j // LANES
        bit = (
            jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) & q
        ) != 0
        return jnp.where(bit, _roll(x, q, 0), _roll(x, -q, 0))
    bit = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) & j) != 0
    return jnp.where(bit, _roll(x, j, 1), _roll(x, -j, 1))


def _lex_less_eq(a_words, b_words):
    """Elementwise lexicographic (a < b, a == b) over word lists."""
    less = jnp.zeros(a_words[0].shape, dtype=jnp.bool_)
    eq = jnp.ones(a_words[0].shape, dtype=jnp.bool_)
    for aw, bw in zip(a_words, b_words):
        less = less | (eq & (aw < bw))
        eq = eq & (aw == bw)
    return less, eq


def _cex(arrs, n_words, j, take_min_if_low, i_idx):
    """One compare-exchange step at XOR-distance j.

    take_min_if_low: (shape) bool — for the element whose j-bit is 0, keep
    the min (ascending region) or the max (descending region).
    """
    partners = [_partner(a, j) for a in arrs]
    less, eq = _lex_less_eq(arrs[:n_words], partners[:n_words])
    greater = ~(less | eq)
    bit = (i_idx & j) != 0
    take_min = take_min_if_low ^ bit
    swap = jnp.where(take_min, greater, less)
    return [jnp.where(swap, p, a) for a, p in zip(arrs, partners)]


def _logical_index(shape) -> jnp.ndarray:
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return rows * LANES + cols


def _xor_permute(x: jnp.ndarray, mask: int) -> jnp.ndarray:
    """Permute a (R,128) row-major array by index XOR mask (e.g. a flip)."""
    j = 1
    while j <= mask:
        if mask & j:
            x = _partner(x, j)
        j <<= 1
    return x


# ---------------------------------------------------------------------------
# Phase A: block-local bitonic sort.
# ---------------------------------------------------------------------------


def _block_sort_kernel(n_arrays: int, n_words: int, block_rows: int):
    B = block_rows * LANES

    def kernel(*refs):
        ins, outs = refs[:n_arrays], refs[n_arrays:]
        arrs = [r[:] for r in ins]
        i_idx = _logical_index(arrs[0].shape)
        k = 2
        while k <= B:
            asc = (i_idx & k) == 0 if k < B else jnp.ones(
                i_idx.shape, jnp.bool_
            )
            j = k // 2
            while j >= 1:
                arrs = _cex(arrs, n_words, j, asc, i_idx)
                j //= 2
            k *= 2
        for o, a in zip(outs, arrs):
            o[:] = a

    return kernel


def block_bitonic_sort(
    arrays: Sequence[jnp.ndarray], n_words: int, block_rows: int
) -> list[jnp.ndarray]:
    """Sort each B=block_rows*128 block of the (row-major) arrays ascending."""
    n = arrays[0].shape[0]
    assert n % (block_rows * LANES) == 0, (n, block_rows)
    n_blocks = n // (block_rows * LANES)
    arrs2d = [a.reshape(n // LANES, LANES) for a in arrays]
    spec = pl.BlockSpec(
        (block_rows, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _block_sort_kernel(len(arrays), n_words, block_rows),
        grid=(n_blocks,),
        in_specs=[spec] * len(arrays),
        out_specs=[spec] * len(arrays),
        out_shape=[
            jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs2d
        ],
        interpret=_INTERPRET,
    )(*arrs2d)
    return [o.reshape(n) for o in out]


# ---------------------------------------------------------------------------
# Phase B: merge-path pairwise merge of sorted runs.
# ---------------------------------------------------------------------------


def _merge_partitions(words: Sequence[jnp.ndarray], run_len: int, chunk: int):
    """For every C-element output chunk, the merge-path split of its run pair.

    Returns (a_start, a_valid, b_start, b_valid) int32 arrays of length
    n_chunks (global element indices / valid window lengths).
    """
    n = words[0].shape[0]
    pairs = n // (2 * run_len)
    chunks_per_pair = (2 * run_len) // chunk
    n_chunks = pairs * chunks_per_pair

    cidx = jnp.arange(n_chunks, dtype=jnp.int32)
    pair = cidx // chunks_per_pair
    t = (cidx % chunks_per_pair) * chunk  # output offset within the pair
    a_base = pair * (2 * run_len)
    b_base = a_base + run_len

    lo = jnp.maximum(0, t - run_len)
    hi = jnp.minimum(t, run_len)

    def gather(idx):
        return [w[idx] for w in words]

    def cond(state):
        lo, hi = state
        return jnp.any(lo < hi)

    def body(state):
        lo, hi = state
        mid = (lo + hi) // 2
        # Compare A[mid] vs B[t - mid - 1]: if A[mid] < B[t-mid-1] (lex),
        # the split lies right of mid.
        a_vals = gather(a_base + jnp.minimum(mid, run_len - 1))
        b_idx = jnp.clip(t - mid - 1, 0, run_len - 1)
        b_vals = gather(b_base + b_idx)
        less, eq = _lex_less_eq(a_vals, b_vals)
        go_right = less | eq
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where(go_right, hi, mid)
        active = lo < hi
        return (
            jnp.where(active, new_lo, lo),
            jnp.where(active, new_hi, hi),
        )

    lo, hi = jax.lax.while_loop(cond, body, (lo, hi))
    ai = lo  # split: first ai elements of A-run are in output[:t]
    bi = t - ai
    a_start = a_base + ai
    b_start = b_base + bi
    a_valid = jnp.minimum(run_len - ai, chunk)
    b_valid = jnp.minimum(run_len - bi, chunk)
    return a_start, a_valid, b_start, b_valid


def _merge_kernel(n_arrays: int, n_words: int, chunk: int):
    rows2 = (2 * chunk) // LANES  # rows of the merged window

    def kernel(*refs):
        # scalar prefetch: a_start, a_valid, b_start, b_valid
        a_start, a_valid, b_start, b_valid = refs[:4]
        ins = refs[4 : 4 + n_arrays]
        outs = refs[4 + n_arrays : 4 + 2 * n_arrays]
        scratch = refs[4 + 2 * n_arrays : 4 + 3 * n_arrays]
        sems = refs[4 + 3 * n_arrays]

        g = pl.program_id(0)
        asg = a_start[g]
        bsg = b_start[g]

        for x in range(n_arrays):
            pltpu.make_async_copy(
                ins[x].at[pl.ds(asg, chunk)],
                scratch[x].at[pl.ds(0, chunk)],
                sems.at[2 * x],
            ).start()
            pltpu.make_async_copy(
                ins[x].at[pl.ds(bsg, chunk)],
                scratch[x].at[pl.ds(chunk, chunk)],
                sems.at[2 * x + 1],
            ).start()
        for x in range(n_arrays):
            pltpu.make_async_copy(
                ins[x].at[pl.ds(asg, chunk)],
                scratch[x].at[pl.ds(0, chunk)],
                sems.at[2 * x],
            ).wait()
            pltpu.make_async_copy(
                ins[x].at[pl.ds(bsg, chunk)],
                scratch[x].at[pl.ds(chunk, chunk)],
                sems.at[2 * x + 1],
            ).wait()

        arrs = [s[:].reshape(rows2, LANES) for s in scratch]
        i_idx = _logical_index(arrs[0].shape)

        # Mask run overhang with the sentinel (key words only).
        in_a = i_idx < chunk
        pos_in_win = jnp.where(in_a, i_idx, i_idx - chunk)
        valid = jnp.where(in_a, pos_in_win < a_valid[g], pos_in_win < b_valid[g])
        for w in range(n_words):
            arrs[w] = jnp.where(valid, arrs[w], _FULL32)

        # Flip the B window (upper half) so the whole window is bitonic:
        # indices chunk..2*chunk-1 reversed == XOR with (chunk-1) inside the
        # half. Compute the fully flipped copy and select it for the B half.
        flipped = [_xor_permute(a, chunk - 1) for a in arrs]
        arrs = [
            jnp.where(in_a, a, f) for a, f in zip(arrs, flipped)
        ]

        # Bitonic merge: the sequence (asc A ++ desc B) sorts ascending with
        # steps j = chunk .. 1.
        asc = jnp.ones(i_idx.shape, jnp.bool_)
        j = chunk
        while j >= 1:
            arrs = _cex(arrs, n_words, j, asc, i_idx)
            j //= 2

        rows_out = chunk // LANES
        for o, a in zip(outs, arrs):
            o[:] = a[:rows_out].reshape(chunk)

    return kernel


def merge_level(
    arrays: Sequence[jnp.ndarray],
    n_words: int,
    run_len: int,
    chunk: int,
) -> list[jnp.ndarray]:
    """One bottom-up merge level: sorted runs of run_len -> runs of 2*run_len."""
    n = arrays[0].shape[0]
    assert n % (2 * run_len) == 0, (n, run_len)
    a_start, a_valid, b_start, b_valid = _merge_partitions(
        list(arrays[:n_words]), run_len, chunk
    )
    n_chunks = a_start.shape[0]

    # Pad the source arrays so window DMAs never run off the end.
    padded = [
        jnp.concatenate([a, jnp.full((chunk,), _FULL32, dtype=a.dtype)])
        for a in arrays
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(arrays),
        out_specs=[
            # index_map receives (grid_idx, *scalar_prefetch_refs).
            pl.BlockSpec(
                (chunk,), lambda g, *_: (g,), memory_space=pltpu.VMEM
            )
        ]
        * len(arrays),
        scratch_shapes=[pltpu.VMEM((2 * chunk,), jnp.uint32)] * len(arrays)
        + [pltpu.SemaphoreType.DMA((2 * len(arrays),))],
    )
    out = pl.pallas_call(
        _merge_kernel(len(arrays), n_words, chunk),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n,), a.dtype) for a in arrays],
        interpret=_INTERPRET,
    )(a_start, a_valid, b_start, b_valid, *padded)
    return list(out)


# ---------------------------------------------------------------------------
# Orchestrator.
# ---------------------------------------------------------------------------


def sort_words(
    words: Sequence[jnp.ndarray],
    payloads: Sequence[jnp.ndarray] = (),
    block_rows: int = 128,
    chunk: int = 4096,
) -> tuple[list[jnp.ndarray], list[jnp.ndarray]]:
    """Sort 1-D uint32 key words (lexicographic) with payloads, ascending.

    Invalid slots must carry the all-ones sentinel in every key word. The
    input is padded (with the sentinel) to B * 2^m; the pad is sliced off on
    return, which is safe because the sentinel sorts strictly last.
    """
    n_words = len(words)
    arrays = [w.astype(jnp.uint32) for w in words] + [
        p.astype(jnp.uint32) for p in payloads
    ]
    n = arrays[0].shape[0]
    if n == 0:
        return list(arrays[:n_words]), list(arrays[n_words:])
    block = block_rows * LANES

    # Pad to block * 2^m.
    n_blocks = max(1, -(-n // block))
    m = 1
    while m < n_blocks:
        m *= 2
    n_pad = m * block
    if n_pad != n:
        arrays = [
            jnp.concatenate(
                [a, jnp.full((n_pad - n,), _FULL32, dtype=a.dtype)]
            )
            for a in arrays
        ]

    arrays = block_bitonic_sort(arrays, n_words, block_rows)
    run = block
    while run < n_pad:
        arrays = merge_level(arrays, n_words, run, min(chunk, run))
        run *= 2

    arrays = [a[:n] for a in arrays]
    return arrays[:n_words], arrays[n_words:]
