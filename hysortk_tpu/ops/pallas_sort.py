"""On-chip hybrid sort in Pallas: the TPU's answer to PARADIS/RADULS.

The reference spends most of its runtime in vendored CPU radix sorts
(dependency/Paradis, dependency/Raduls — SURVEY.md §2 #17-18). A radix
scatter is hostile to the TPU's (8,128) tiling, so this kernel family uses
bitonic comparison networks, which are pure dense vector ops:

  Phase A — block bitonic sort: the input, viewed as (rows, 128) row-major,
  is cut into VMEM-resident blocks of B = R*128 elements; a full bitonic
  network sorts each block. Every compare-exchange partner i^j is fetched
  with two circular rolls (lane rolls for j<128, sublane rolls for j>=128)
  and a bit-select — no gathers, no scatters, no data-dependent control
  flow. Directions use *global* element indices, so blocks come out
  alternately ascending/descending, exactly what the merge levels need.

  Phase B — fused global bitonic merge levels: for strides j >= B the
  compare partners live in different blocks, which differ only in one bit of
  the block index. A pallas kernel pulls 2^f partner blocks per grid step
  (static index maps — block index XOR is pure arithmetic on the grid id)
  and performs f cross-strides in VMEM per HBM pass; the remaining strides
  j < B of each level are one more block-local pass. This keeps every HBM
  offset static and cuts the classic log^2 global-pass blowup by f.

Keys are W uint32 words compared lexicographically; any number of payload
words ride along. Invalid slots must already carry the all-ones sentinel
(ops/sort.py), which sorts last and pads safely.

Mosaic notes: no select-of-booleans (i8->i1 truncation is unsupported) —
all mask logic is and/or/xor of i1 or int32 bit arithmetic.
"""

from __future__ import annotations

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
    # pltpu.roll requires a non-negative shift.
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _partner(x: jnp.ndarray, j: int) -> jnp.ndarray:
    """Value at row-major logical index i^j of a (R, 128) array (j < R*128)."""
    if j >= LANES:
        q = j // LANES
        bit = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) & q) != 0
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


def _lex_less(a_words, b_words):
    """Elementwise strict lexicographic a < b over word lists."""
    less = a_words[0] < b_words[0]
    if len(a_words) == 1:
        return less
    eq = a_words[0] == b_words[0]
    for aw, bw in zip(a_words[1:-1], b_words[1:-1]):
        less = less | (eq & (aw < bw))
        eq = eq & (aw == bw)
    less = less | (eq & (a_words[-1] < b_words[-1]))
    return less


def _lex_less_leq(a_words, b_words):
    """Elementwise lexicographic (a < b, a <= b) over word lists.

    Three fewer vector ops per compare-exchange than the less/eq/greater
    chain when the consumer needs strict-less one way and its complement
    the other (swap masks): a > b is just ~(a <= b).
    """
    less = a_words[0] < b_words[0]
    if len(a_words) == 1:
        return less, less | (a_words[0] == b_words[0])
    eq = a_words[0] == b_words[0]
    for aw, bw in zip(a_words[1:-1], b_words[1:-1]):
        less = less | (eq & (aw < bw))
        eq = eq & (aw == bw)
    aw, bw = a_words[-1], b_words[-1]
    less = less | (eq & (aw < bw))
    leq = less | (eq & (aw == bw))
    return less, leq


def _cex_local(arrs, n_words, j, k_bitpos, i_global):
    """Compare-exchange at roll distance j (< B) with global bitonic rule.

    k_bitpos: bit position of the region size k in the global index —
    take_min iff bit_k(i) == bit_j(i).
    """
    partners = [_partner(a, j) for a in arrs]
    less, eq = _lex_less_eq(arrs[:n_words], partners[:n_words])
    greater = ~(less | eq)
    bit_k = (i_global >> k_bitpos) & 1
    bit_j = (i_global >> (int(j).bit_length() - 1)) & 1
    take_min = (bit_k ^ bit_j) == 0
    swap = (take_min & greater) | (~take_min & less)
    return [jnp.where(swap, p, a) for a, p in zip(arrs, partners)]


def _logical_index(shape) -> jnp.ndarray:
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return rows * LANES + cols


# ---------------------------------------------------------------------------
# Phase A: block-local bitonic sort (global directions).
# ---------------------------------------------------------------------------


def _block_sort_kernel(n_arrays: int, n_words: int, block_rows: int):
    B = block_rows * LANES

    def kernel(*refs):
        ins, outs = refs[:n_arrays], refs[n_arrays:]
        arrs = [r[:] for r in ins]
        beta = pl.program_id(0)
        i_global = _logical_index(arrs[0].shape) + beta * B
        k = 2
        while k <= B:
            j = k // 2
            while j >= 1:
                arrs = _cex_local(
                    arrs, n_words, j, int(k).bit_length() - 1, i_global
                )
                j //= 2
            k *= 2
        for o, a in zip(outs, arrs):
            o[:] = a

    return kernel


def block_bitonic_sort(
    arrays: Sequence[jnp.ndarray], n_words: int, block_rows: int
) -> list[jnp.ndarray]:
    """Bitonic-sort each B-element block; block b ascending iff bit_B(b*B)==0,
    i.e. blocks alternate asc/desc — the orientation merge levels expect."""
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
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs2d],
        interpret=_INTERPRET,
    )(*arrs2d)
    return [o.reshape(n) for o in out]


# ---------------------------------------------------------------------------
# Phase B: fused cross-block strides + block-local tails.
# ---------------------------------------------------------------------------


def _cross_kernel(n_arrays: int, n_words: int, block_rows: int, f: int):
    """Perform f cross-strides j = B*2^s, s in [s_lo+f-1 .. s_lo], in VMEM.

    Each grid step owns one *group* of 2^f blocks (the blocks whose indices
    differ only in bits [s_lo, s_lo+f)), DMAs them into VMEM, runs the f
    cross-strides as member-array compare-exchanges (no rolls needed — the
    partner is a different member), and DMAs them back. Groups tile the
    block space, so every pass reads and writes each element exactly once.

    The level parameters (s_lo, k_blockbit) arrive as scalar-prefetch values
    so one compiled kernel serves every merge level (per f) — level-baked
    constants would mean ~log^2(N/B) separate Mosaic compiles.
    """
    n_members = 1 << f
    R = block_rows

    def kernel(params_ref, *refs):
        s_lo = params_ref[0]
        k_blockbit = params_ref[1]
        ins = refs[:n_arrays]
        outs = refs[n_arrays : 2 * n_arrays]
        scratch = refs[2 * n_arrays : 3 * n_arrays]  # (n_members*R, 128)
        sems = refs[3 * n_arrays]

        g = pl.program_id(0)
        lo = g & ((1 << s_lo) - 1)
        hi = g >> s_lo

        def beta_of(m):
            return (hi << (s_lo + f)) | (m << s_lo) | lo

        for x in range(n_arrays):
            for m in range(n_members):
                pltpu.make_async_copy(
                    ins[x].at[pl.ds(beta_of(m) * R, R), :],
                    scratch[x].at[pl.ds(m * R, R), :],
                    sems.at[x * n_members + m],
                ).start()
        for x in range(n_arrays):
            for m in range(n_members):
                pltpu.make_async_copy(
                    ins[x].at[pl.ds(beta_of(m) * R, R), :],
                    scratch[x].at[pl.ds(m * R, R), :],
                    sems.at[x * n_members + m],
                ).wait()

        vals = [
            [scratch[x][m * R : (m + 1) * R, :] for m in range(n_members)]
            for x in range(n_arrays)
        ]
        for bitpos in range(f - 1, -1, -1):  # descending strides
            for m in range(n_members):
                if (m >> bitpos) & 1:
                    continue  # handled with its lower partner
                pm = m | (1 << bitpos)
                lo_w = [vals[x][m] for x in range(n_arrays)]
                hi_w = [vals[x][pm] for x in range(n_arrays)]
                # take_min for the lower member iff the region bit is 0;
                # that bit is outside the member bits, so it is uniform
                # across the group members of this pair. Paired exchange
                # (one mask drives both slots): ties-as-greater is
                # consistent and safe with payloads. swap = tm ? (hi<lo)
                # : ~(hi<lo), xor form (no select-of-booleans on Mosaic).
                less = _lex_less(hi_w[:n_words], lo_w[:n_words])
                take_min = ((beta_of(m) >> k_blockbit) & 1) == 0
                swap = ~(less ^ take_min)
                for x in range(n_arrays):
                    new_lo = jnp.where(swap, hi_w[x], lo_w[x])
                    new_hi = jnp.where(swap, lo_w[x], hi_w[x])
                    vals[x][m] = new_lo
                    vals[x][pm] = new_hi
        for x in range(n_arrays):
            for m in range(n_members):
                scratch[x][m * R : (m + 1) * R, :] = vals[x][m]
        for x in range(n_arrays):
            for m in range(n_members):
                pltpu.make_async_copy(
                    scratch[x].at[pl.ds(m * R, R), :],
                    outs[x].at[pl.ds(beta_of(m) * R, R), :],
                    sems.at[x * n_members + m],
                ).start()
        for x in range(n_arrays):
            for m in range(n_members):
                pltpu.make_async_copy(
                    scratch[x].at[pl.ds(m * R, R), :],
                    outs[x].at[pl.ds(beta_of(m) * R, R), :],
                    sems.at[x * n_members + m],
                ).wait()

    return kernel


def _tail_kernel(n_arrays: int, n_words: int, block_rows: int):
    """Strides j = B/2 .. 1 of one merge level, block-local.

    The level's k-bit position arrives as a scalar-prefetch value: one
    compiled kernel serves all levels."""
    B = block_rows * LANES

    def kernel(params_ref, *refs):
        k_bitpos = params_ref[0]
        ins, outs = refs[:n_arrays], refs[n_arrays:]
        arrs = [r[:] for r in ins]
        beta = pl.program_id(0)
        i_global = _logical_index(arrs[0].shape) + beta * B
        j = B // 2
        while j >= 1:
            arrs = _cex_local(arrs, n_words, j, k_bitpos, i_global)
            j //= 2
        for o, a in zip(outs, arrs):
            o[:] = a

    return kernel


def merge_levels(
    arrays: Sequence[jnp.ndarray],
    n_words: int,
    block_rows: int,
    fuse_bits: int = 3,
    start_k: int | None = None,
    tail: str = "roll",
) -> list[jnp.ndarray]:
    """Run bitonic merge levels from region size `start_k` (default: just
    above the block size) up to the array length.

    With start_k = 2L the input must consist of length-L regions forming
    bitonic sequences in the standard network orientation (e.g. sorted runs
    with every odd run reversed) — the entry point merge_sorted_runs uses.
    """
    n = arrays[0].shape[0]
    block = block_rows * LANES
    n_blocks = n // block
    arrs2d = [a.reshape(n // LANES, LANES) for a in arrays]
    n_arrays = len(arrays)

    if tail == "member":
        from . import pallas_msort

        log_b = int(block).bit_length() - 1
        tail_kernel = pallas_msort._tail_member_kernel(
            n_arrays, n_words, log_b
        )
    else:
        tail_kernel = _tail_kernel(n_arrays, n_words, block_rows)

    # index_map receives (grid_idx, *scalar_prefetch_refs).
    tail_spec = pl.BlockSpec(
        (block_rows, LANES), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    k = start_k if start_k is not None else 2 * block
    assert k >= 2 * block, (k, block)
    log_b = int(block).bit_length() - 1
    while k <= n:
        u = int(k // block).bit_length() - 2  # k = 2B * 2^u
        k_blockbit = u + 1  # bit of the block index
        k_bitpos = int(k).bit_length() - 1  # bit of the global index
        # Cross strides: s = u .. 0 (j = B * 2^s), fused in contiguous
        # bit-range groups of at most fuse_bits.
        s_list = list(range(u, -1, -1))
        idx = 0
        tail_fused = False
        while idx < len(s_list):
            group = tuple(s_list[idx : idx + fuse_bits])
            idx += len(group)
            f = len(group)
            s_lo = group[-1]
            n_groups = n_blocks >> f
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_groups,),
                in_specs=[any_spec] * n_arrays,
                out_specs=[any_spec] * n_arrays,
                scratch_shapes=[
                    pltpu.VMEM(((1 << f) * block_rows, LANES), jnp.uint32)
                    for _ in range(n_arrays)
                ]
                + [pltpu.SemaphoreType.DMA((n_arrays * (1 << f),))],
            )
            if tail == "member" and s_lo == 0:
                # Final cross group: fold this level's block-local tail
                # into the same HBM round trip (one pass saved per level).
                from . import pallas_msort

                kern = pallas_msort._cross_tail_member_kernel(
                    n_arrays, n_words, log_b, f
                )
                params = jnp.asarray(
                    [k_blockbit, k_bitpos], dtype=jnp.int32
                )
                tail_fused = True
            else:
                kern = _cross_kernel(n_arrays, n_words, block_rows, f)
                params = jnp.asarray([s_lo, k_blockbit], dtype=jnp.int32)
            arrs2d = list(
                pl.pallas_call(
                    kern,
                    grid_spec=grid_spec,
                    out_shape=[
                        jax.ShapeDtypeStruct(a.shape, a.dtype)
                        for a in arrs2d
                    ],
                    compiler_params=pltpu.CompilerParams(
                        has_side_effects=True
                    ),
                    interpret=_INTERPRET,
                )(params, *arrs2d)
            )
        if not tail_fused:
            # Local tail for this level (strides j < B).
            tail_grid = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_blocks,),
                in_specs=[tail_spec] * n_arrays,
                out_specs=[tail_spec] * n_arrays,
            )
            arrs2d = list(
                pl.pallas_call(
                    tail_kernel,
                    grid_spec=tail_grid,
                    out_shape=[
                        jax.ShapeDtypeStruct(a.shape, a.dtype)
                        for a in arrs2d
                    ],
                    interpret=_INTERPRET,
                )(jnp.asarray([k_bitpos], dtype=jnp.int32), *arrs2d)
            )
        k *= 2
    return [a.reshape(n) for a in arrs2d]


# ---------------------------------------------------------------------------
# Orchestrator.
# ---------------------------------------------------------------------------


# Scratch-byte budget for the fused cross kernel (2^f blocks per array held
# in VMEM scratch). The compiler's scoped-vmem footprint is ~2.3-2.7x the
# scratch bytes (measured on chip: 8.4 MiB scratch -> 19.2 MiB scoped;
# 6.3 MiB scratch, 3 arrays, member path -> 17.04 MiB scoped > the 16 MiB
# limit), so scratch must stay at or below ~5.5 MiB. 5 MiB keeps the
# known-good 2-array 512-row config at f=3 (4.2 MiB) and drops 3-array
# merges (keys + count payload) to f=2 (3.1 MiB).
_CROSS_SCRATCH_BUDGET = 5 * 1024 * 1024


def cap_fuse_bits(fuse_bits: int, block: int, n_arrays: int) -> int:
    """Largest fuse width whose cross-kernel scratch fits scoped VMEM."""
    budget = _CROSS_SCRATCH_BUDGET
    from . import pallas_msort

    if pallas_msort._PARTNER == "mxu":
        # The matmul partner's (128,128) permutation operands + f32 halves
        # add ~2 MiB of kernel stack inside the fused cross+tail kernel
        # (measured: 17.69M scoped > the 16M limit at f=3/512 rows/2 arr).
        budget = 3 * 1024 * 1024
    while (
        fuse_bits > 1
        and (1 << fuse_bits) * block * 4 * n_arrays > budget
    ):
        fuse_bits -= 1
    return fuse_bits


def sort_words(
    words: Sequence[jnp.ndarray],
    payloads: Sequence[jnp.ndarray] = (),
    block_rows: int = 512,
    fuse_bits: int = 4,
    formulation: str = "member",
) -> tuple[list[jnp.ndarray], list[jnp.ndarray]]:
    """Sort 1-D uint32 key words (lexicographic) with payloads, ascending.

    Invalid slots must carry the all-ones sentinel in every key word. The
    input is padded (with the sentinel) to B * 2^m; the pad is sliced off on
    return, which is safe because the sentinel sorts strictly last.

    formulation="member" (default) uses the round-3 row-group kernels
    (ops/pallas_msort.py: static-slice partner fetch for the 5 high row
    bits, bit-permuted layout end-to-end with one XLA un-permute at the
    end); "roll" keeps the round-2 all-roll kernels. Member requires the
    fixed 256-row block geometry; other block_rows fall back to roll.
    """
    n_words = len(words)
    arrays = [w.astype(jnp.uint32) for w in words] + [
        p.astype(jnp.uint32) for p in payloads
    ]
    n = arrays[0].shape[0]
    if n == 0:
        return list(arrays[:n_words]), list(arrays[n_words:])
    if _INTERPRET and block_rows > 16:
        # Interpret mode (CPU tests) emulates every unrolled stage over
        # every member tile in Python; production geometry takes tens of
        # minutes to trace. 16 rows keeps the same code paths (member
        # stages, rolls, fused cross+tail) at tractable size.
        block_rows = 16
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

    fuse_bits = cap_fuse_bits(fuse_bits, block, len(arrays))

    log_b = int(block).bit_length() - 1
    if formulation == "member" and (
        block & (block - 1) != 0 or log_b < 11
    ):
        formulation = "roll"  # member needs a pow2 block of >= 2 members

    if formulation == "member":
        from . import pallas_msort

        arrays = pallas_msort.block_sort_member(arrays, n_words, log_b)
        if n_pad > block:
            arrays = merge_levels(
                arrays, n_words, block_rows, fuse_bits, tail="member"
            )
        arrays = [pallas_msort.unpermute_blocks(a, log_b) for a in arrays]
    else:
        arrays = block_bitonic_sort(arrays, n_words, block_rows)
        if n_pad > block:
            arrays = merge_levels(arrays, n_words, block_rows, fuse_bits)

    arrays = [a[:n] for a in arrays]
    return arrays[:n_words], arrays[n_words:]


def sort_codes_fused(
    codes: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    block_rows: int = 512,
    fuse_bits: int = 4,
) -> list[jnp.ndarray]:
    """codes (N,) int8 + valid (N,) bool -> W ascending sentinel-marked key
    word arrays, with the canonical-key construction fused INTO phase A of
    the member sort (pallas_msort.block_sort_keybuild): the key words never
    round-trip through HBM between keybuild and the block sort, saving
    ~2 HBM passes per word vs canonical_keys_fused + sort_words.

    Only the plain single-chip path qualifies (no payloads, no key mixing);
    callers with either fall back to the unfused pair.
    """
    from . import pallas_msort

    w_count = (k + 15) // 16
    n = codes.shape[0]
    if n == 0:
        return [jnp.zeros(0, jnp.uint32) for _ in range(w_count)]
    if _INTERPRET and block_rows > 16:
        block_rows = 16  # same tractable-interpret geometry as sort_words
    block = block_rows * LANES

    n_blocks = max(1, -(-n // block))
    m = 1
    while m < n_blocks:
        m *= 2
    n_pad = m * block
    halo = 8 * LANES
    codes_p = jnp.concatenate(
        [codes.astype(jnp.int32), jnp.zeros(n_pad - n + halo, jnp.int32)]
    )
    valid_p = jnp.concatenate(
        [valid, jnp.zeros(n_pad - n, dtype=valid.dtype)]
    ).astype(jnp.int32)

    log_b = int(block).bit_length() - 1
    assert block & (block - 1) == 0 and log_b >= 11, block

    arrays = pallas_msort.block_sort_keybuild(
        codes_p.reshape(-1, LANES), valid_p.reshape(-1, LANES), k, log_b
    )
    if n_pad > block:
        fuse_bits = cap_fuse_bits(fuse_bits, block, w_count)
        arrays = merge_levels(
            arrays, w_count, block_rows, fuse_bits, tail="member"
        )
    arrays = [pallas_msort.unpermute_blocks(a, log_b) for a in arrays]
    return [a[:n] for a in arrays]


def merge_runs(
    arrays: Sequence[jnp.ndarray],
    n_words: int,
    run_len: int,
    block_rows: int = 256,
    fuse_bits: int = 4,
    formulation: str = "roll",
) -> list[jnp.ndarray]:
    """Merge N/run_len ascending sorted runs with the Pallas merge levels.

    Entry point for the receive side of the range exchange on TPU: runs are
    reversed at odd positions (one cheap XLA pass) so each run pair forms a
    bitonic sequence, then the sort's own merge-level kernels finish from
    region size 2*run_len — log2(runs) levels instead of a full sort.

    run_len must be a power of two and a multiple of the block size; the
    total length must be run_len * 2^m.
    """
    n = arrays[0].shape[0]
    s = n // run_len
    assert s & (s - 1) == 0 and run_len & (run_len - 1) == 0, (s, run_len)
    block = block_rows * LANES
    assert run_len % block == 0, (run_len, block)
    if s == 1:
        return [a.astype(jnp.uint32) for a in arrays]

    from .merge import flip_odd_runs  # single orientation definition

    arrays = flip_odd_runs(arrays, s, run_len)

    fuse_bits = cap_fuse_bits(fuse_bits, block, len(arrays))
    log_b = int(block).bit_length() - 1
    if formulation == "member" and block & (block - 1) == 0 and log_b >= 11:
        from . import pallas_msort

        # Inputs arrive physically ordered: move to the permuted layout,
        # run the cheap member tails, restore order once at the end.
        arrays = [pallas_msort.permute_blocks(a, log_b) for a in arrays]
        arrays = merge_levels(
            arrays, n_words, block_rows, fuse_bits, start_k=2 * run_len,
            tail="member",
        )
        return [pallas_msort.unpermute_blocks(a, log_b) for a in arrays]
    return merge_levels(
        arrays, n_words, block_rows, fuse_bits, start_k=2 * run_len
    )
