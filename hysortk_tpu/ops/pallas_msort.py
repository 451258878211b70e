"""Member-tile bitonic block sort: phase A/tails as compare/selects on vregs.

Round-3 redesign of the in-VMEM parts of ops/pallas_sort.py, motivated by the
round-2 measurement that phase A is COMPUTE-bound (131 ms of 289 at 2^26 —
CLAUDE.md ledger): every compare-exchange stage there fetches its partner with
two circular rolls, and rolls (Mosaic relayouts) dominate the stage cost.

Design: each B-element block, viewed as (R, 128), is held as M = R/8 named
"member" tiles of exactly one (8, 128) vreg each. The block is BIT-PERMUTED:

    physical slot (8*m + r0, c) holds logical element
        i = m | (r0 << mb) | (c << (mb + 3)),      mb = log2(M)

so the logical LOW bits — which repeat most in a bitonic network (stride 2^s
occurs log2(B)-s times) — live on the member axis. A compare-exchange whose
stride bit is a member bit is then a pure elementwise compare/select between
two named tiles: no rolls, no relayouts, no reshapes — and its direction is
often a *python constant* (when the region bit is also a member bit), which
deletes the mask logic entirely. Only the 3 sublane bits and 7 lane bits pay
partner rolls.

The permutation is block-local and identical in every block, so the ENTIRE
sort runs in permuted layout: cross-block merge strides (j >= B) pair
identical intra-block offsets — pallas_sort._cross_kernel is elementwise
between blocks and needs no change — and the per-level tails use the same
member map (_tail_member_kernel). Mosaic cannot lower an in-kernel un-permute
((32,8,128) transpose = "unsupported shape cast"), so the single physical-
order restore is ONE XLA transpose after the last merge level
(unpermute_blocks) — ~2 HBM passes per array, microseconds next to the sort.

Geometry is parametric in log2(B) (block_rows = 2^(log_b-7)); bigger blocks
strictly help: the paid (rolled) stages per phase-A network are a constant
sum(1..10) = 55 and each merge level's tail pays exactly 10 rolled stages, so
raising B converts whole merge levels into cheap member stages.

Reference role: PARADIS/RADULS (dependency/Paradis/paradissort.hpp,
dependency/Raduls/raduls.h:349-546) — the reference's CPU radix sorts; on TPU
comparison networks are the correct architecture (radix scatter measured
dead, CLAUDE.md) and this module is about minimizing per-stage vector cost.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_sort
from .pallas_sort import LANES, _lex_less, _lex_less_leq, _roll

_FULL32 = np.uint32(0xFFFFFFFF)

# Default geometry: B = 2^15 elements per block as (256, 128).
BLOCK_ROWS = 256
BLOCK = BLOCK_ROWS * LANES  # 32768
LOG_B = 15


def _geometry(log_b: int):
    """(rows, members, member_bits) for a 2^log_b-element block."""
    assert log_b >= 11, log_b  # at least 2 members
    rows = 1 << (log_b - 7)
    m = rows // 8
    return rows, m, log_b - 10


# ---------------------------------------------------------------------------
# Layout: logical <-> physical (XLA-level, outside kernels).
# ---------------------------------------------------------------------------


def permute_blocks(a: jnp.ndarray, log_b: int = LOG_B) -> jnp.ndarray:
    """Physical order -> permuted layout, block-locally (1-D, n % B == 0).

    After this, physical slot (8m + r0, c) of each block holds the element
    whose physical index within the block was m | (r0 << mb) | (c << mb+3).
    """
    n = a.shape[0]
    block = 1 << log_b
    _, m, _ = _geometry(log_b)
    return (
        a.reshape(n // block, LANES, 8, m).transpose(0, 3, 2, 1).reshape(n)
    )


def unpermute_blocks(a: jnp.ndarray, log_b: int = LOG_B) -> jnp.ndarray:
    """Permuted layout -> physical order; exact inverse of permute_blocks."""
    n = a.shape[0]
    block = 1 << log_b
    _, m, _ = _geometry(log_b)
    return (
        a.reshape(n // block, m, 8, LANES).transpose(0, 3, 2, 1).reshape(n)
    )


# ---------------------------------------------------------------------------
# In-kernel building blocks. `mem` is mem[array][member] -> (8, 128) tile.
# ---------------------------------------------------------------------------


def _pair_cex(los, his, n_words, take_min_lo):
    """Compare-exchange between two member tiles (lo has stride bit 0).

    take_min_lo may be a python bool (fully static direction — minimal op
    count), a traced scalar bool, or an (8, 128) mask; all broadcast.

    Ties swap as whole pairs: the sort is unstable (like lax.sort
    is_stable=False and the reference's radix sorts on full records), so
    exchanging an equal-key pair — keys AND payloads together — is an
    equally valid order. Treating ties as "greater" deletes the whole
    equality chain (~6 vector ops) from every compare-exchange.
    """
    if take_min_lo is True:
        swap = _lex_less(his[:n_words], los[:n_words])
    elif take_min_lo is False:
        swap = _lex_less(los[:n_words], his[:n_words])
    else:
        # swap = tm ? (hi<lo) : ~(hi<lo), xor form (no select-of-booleans).
        less = _lex_less(his[:n_words], los[:n_words])
        swap = ~(less ^ take_min_lo)
    new_los = [jnp.where(swap, h, l) for l, h in zip(los, his)]
    new_his = [jnp.where(swap, l, h) for l, h in zip(los, his)]
    return new_los, new_his


# Partner fetch formulation for non-top-bit strides: "roll" = two circular
# rolls + iota select (Mosaic relayouts — the measured bulk of a rolled
# stage's 0.89 ms); "mxu" = one constant xor-permutation matmul per u16
# half on the otherwise-idle MXU. The permutation matrix is a CONSTANT
# (this is NOT the rejected rank-sort idea, whose cost was one-hot
# CONSTRUCTION); u16 planes keep f32 exact, Precision.HIGHEST keeps the
# TPU matmul exact for 16-bit integers.
_PARTNER = "mxu" if os.environ.get("HYSORTK_MXU_PARTNER", "0") == "1" \
    else "roll"


def _xor_perm_matrix(n: int, q: int) -> jnp.ndarray:
    """(n, n) f32 with P[j, l] = 1 iff j ^ l == q (symmetric). Built from
    iotas so Pallas kernels don't capture a traced constant; identical
    subexpressions across the members of a stage CSE away."""
    ji = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ((ji ^ li) == q).astype(jnp.float32)


def _partner2_mxu(x: jnp.ndarray, axis: int, q: int) -> jnp.ndarray:
    # Mosaic has no u32<->f32 casts; both u16 halves fit int32 exactly.
    lo = (x & np.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    hi = (x >> np.uint32(16)).astype(jnp.int32).astype(jnp.float32)
    p = _xor_perm_matrix(x.shape[axis], q)
    dot = lambda a: (
        jax.lax.dot(p, a, precision=jax.lax.Precision.HIGHEST)
        if axis == 0
        else jax.lax.dot(a, p, precision=jax.lax.Precision.HIGHEST)
    )
    plo = dot(lo).astype(jnp.int32).astype(jnp.uint32)
    phi = dot(hi).astype(jnp.int32).astype(jnp.uint32)
    return (phi << np.uint32(16)) | plo


def _partner2(x: jnp.ndarray, axis: int, q: int) -> jnp.ndarray:
    """Value at index (coord ^ q) along `axis` of a tile."""
    if 2 * q == x.shape[axis]:
        # Top bit: a circular roll by half the axis IS the xor-swap —
        # one roll, no iota select.
        return _roll(x, q, axis)
    if _PARTNER == "mxu":
        return _partner2_mxu(x, axis, q)
    bit = (jax.lax.broadcasted_iota(jnp.int32, x.shape, axis) & q) != 0
    return jnp.where(bit, _roll(x, q, axis), _roll(x, -q, axis))


def _roll_cex(tiles, n_words, axis, q, take_min, exact_ties):
    """Compare-exchange within one member tile at roll distance q.

    exact_ties=False (key-only sorts, the hot path): ties count as
    "greater" — swap = tm ? ~(x<p) : (x<p) = less ^ tm, one xor instead
    of the whole equality chain. The per-position masks of a tied pair
    disagree then (tm flips across the pair), but both slots hold equal
    VALUES, so either resolution writes the same words — safe exactly
    when every operand is a key word.

    exact_ties=True (payloads ride): tied pairs must make one CONSISTENT
    exchange decision or payloads duplicate/vanish; keep ties unswapped
    via the strict leq chain: swap = less ^ (tm & ~eqm).
    """
    partners = [_partner2(t, axis, q) for t in tiles]
    if exact_ties:
        less, leq = _lex_less_leq(tiles[:n_words], partners[:n_words])
        swap = less ^ (take_min & ~(less ^ leq))
    else:
        less = _lex_less(tiles[:n_words], partners[:n_words])
        swap = less ^ take_min
    return [jnp.where(swap, p, t) for t, p in zip(tiles, partners)]


def _tile_bit(mb: int, p: int) -> jnp.ndarray:
    """(8,128) bool: bit p of the intra-block logical index (p >= mb)."""
    if p < mb + 3:
        axis, bit = 0, p - mb
    else:
        axis, bit = 1, p - mb - 3
    iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), axis)
    return ((iota >> bit) & 1) == 1


def _stage(mem, n_arrays, n_words, mb, log_b, s, bit_k, k_bit):
    """One compare-exchange at logical stride 2^s over all members.

    bit_k describes the enclosing region bit: a python int 0/1 is not
    possible here — it is either None (meaning k_bit < mb: static per
    member), a traced scalar bool, or an (8,128) mask.
    """
    n_members = len(mem[0])
    if s < mb:  # member stage: partner is another named tile
        for m in range(n_members):
            if m & (1 << s):
                continue
            pm = m | (1 << s)
            if bit_k is None:  # k_bit < mb: fully static direction
                tm = ((m >> k_bit) & 1) == 0
            else:  # traced scalar or (8,128) mask; both broadcast
                tm = ~bit_k
            los = [mem[x][m] for x in range(n_arrays)]
            his = [mem[x][pm] for x in range(n_arrays)]
            nl, nh = _pair_cex(los, his, n_words, tm)
            for x in range(n_arrays):
                mem[x][m] = nl[x]
                mem[x][pm] = nh[x]
        return mem
    # roll stage: k_bit > s >= mb, so bit_k is a mask or traced scalar.
    bit_j = _tile_bit(mb, s)
    take_min = bit_j == bit_k
    if s < mb + 3:
        axis, q = 0, 1 << (s - mb)
    else:
        axis, q = 1, 1 << (s - mb - 3)
    exact_ties = n_arrays > n_words  # payloads ride: ties must not swap
    for m in range(n_members):
        tiles = [mem[x][m] for x in range(n_arrays)]
        out = _roll_cex(tiles, n_words, axis, q, take_min, exact_ties)
        for x in range(n_arrays):
            mem[x][m] = out[x]
    return mem


# ---------------------------------------------------------------------------
# Phase A: full bitonic sort of each block, permuted in AND out.
# ---------------------------------------------------------------------------


def _run_block_network(mem, n_arrays, n_words, mb, log_b, beta):
    """The full phase-A bitonic network over member-tile lists; blocks
    alternate asc/desc by the grid index parity (what merge_levels
    expects). Shared by the plain and the fused-keybuild phase-A kernels."""
    k = 2
    while k <= (1 << log_b):
        k_bit = int(k).bit_length() - 1
        if k_bit < mb:
            bit_k = None
        elif k_bit < log_b:
            bit_k = _tile_bit(mb, k_bit)
        else:  # k == B: region bit comes from the block index
            bit_k = (beta & 1) == 1
        j = k // 2
        while j >= 1:
            s = int(j).bit_length() - 1
            mem = _stage(
                mem, n_arrays, n_words, mb, log_b, s, bit_k, k_bit
            )
            j //= 2
        k *= 2
    return mem


def _block_sort_member_kernel(n_arrays: int, n_words: int, log_b: int):
    rows, n_members, mb = _geometry(log_b)

    def kernel(*refs):
        ins, outs = refs[:n_arrays], refs[n_arrays:]
        beta = pl.program_id(0)
        mem = [
            [ins[x][8 * m : 8 * m + 8, :] for m in range(n_members)]
            for x in range(n_arrays)
        ]
        mem = _run_block_network(mem, n_arrays, n_words, mb, log_b, beta)
        for x in range(n_arrays):
            for m in range(n_members):
                outs[x][8 * m : 8 * m + 8, :] = mem[x][m]

    return kernel


def _block_sort_keybuild_kernel(k: int, n_words: int, log_b: int):
    """Fused keybuild + phase A: read raw codes (+halo) and validity,
    derive the W sentinel-marked canonical key words in VMEM
    (ops/keybuild.derive_canonical), then run the whole block network —
    the key words never round-trip through HBM between construction and
    the sort (VERDICT round-3 #10; RADULS fuses passes the same way,
    dependency/Raduls/raduls.h:349-546).

    Phase A sorts, so the arbitrary initial placement of logical elements
    in the permuted member map needs no input permute (same argument as
    block_sort_member)."""
    rows, n_members, mb = _geometry(log_b)

    def kernel(codes_ref, valid_ref, *refs):
        outs = refs[:n_words]
        scratch_c, scratch_v, sems = refs[n_words:]
        from . import keybuild

        keybuild.load_codes_valid(
            codes_ref, valid_ref, scratch_c, scratch_v, sems, rows
        )
        canon = keybuild.derive_canonical(
            scratch_c[:].astype(jnp.uint32), scratch_v[:] == 0, k
        )
        beta = pl.program_id(0)
        mem = [
            [canon[x][8 * m : 8 * m + 8, :] for m in range(n_members)]
            for x in range(n_words)
        ]
        mem = _run_block_network(mem, n_words, n_words, mb, log_b, beta)
        for x in range(n_words):
            for m in range(n_members):
                outs[x][8 * m : 8 * m + 8, :] = mem[x][m]

    return kernel


def block_sort_keybuild(
    codes2d: jnp.ndarray,
    valid2d: jnp.ndarray,
    k: int,
    log_b: int = LOG_B,
) -> list[jnp.ndarray]:
    """codes2d (n/128 + 8, 128) int32 (8 halo rows appended), valid2d
    (n/128, 128) int32 -> W permuted-layout block-sorted key arrays
    (alternating asc/desc), exactly what merge_levels(tail='member')
    consumes. n must be a multiple of 2^log_b."""
    n = valid2d.shape[0] * LANES
    block = 1 << log_b
    rows, _, _ = _geometry(log_b)
    assert n % block == 0, (n, block)
    n_blocks = n // block
    w_count = (k + 15) // 16
    spec = pl.BlockSpec(
        (rows, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _block_sort_keybuild_kernel(k, w_count, log_b),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[spec] * w_count,
        out_shape=[
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint32)
        ] * w_count,
        scratch_shapes=[
            pltpu.VMEM((rows + 8, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=pallas_sort._INTERPRET,
    )(codes2d, valid2d)
    return [o.reshape(n) for o in out]


def block_sort_member(
    arrays: Sequence[jnp.ndarray], n_words: int, log_b: int = LOG_B
) -> list[jnp.ndarray]:
    """Sort each 2^log_b-element block in LOGICAL (permuted-layout) order;
    blocks alternate asc/desc (the orientation merge_levels expects).

    Input order is arbitrary (phase A sorts), so no input permute is needed:
    the physical slots are simply *read* as the permuted map. The output
    stays in permuted layout — run merge levels with tail="member", then
    unpermute_blocks once at the end.
    """
    n = arrays[0].shape[0]
    block = 1 << log_b
    rows, _, _ = _geometry(log_b)
    assert n % block == 0, (n, block)
    n_blocks = n // block
    arrs2d = [a.reshape(n // LANES, LANES) for a in arrays]
    spec = pl.BlockSpec(
        (rows, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _block_sort_member_kernel(len(arrays), n_words, log_b),
        grid=(n_blocks,),
        in_specs=[spec] * len(arrays),
        out_specs=[spec] * len(arrays),
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs2d],
        interpret=pallas_sort._INTERPRET,
    )(*arrs2d)
    return [o.reshape(n) for o in out]


# ---------------------------------------------------------------------------
# Fused final cross pass + tail of one merge level.
# ---------------------------------------------------------------------------


def _cross_tail_member_kernel(
    n_arrays: int, n_words: int, log_b: int, f: int
):
    """The last f cross strides (j = B*2^(f-1) .. B) of a merge level PLUS
    the full block-local tail (strides B/2 .. 1), one HBM round trip.

    The plain formulation pays one extra read+write pass per level for the
    tail (pallas_sort.merge_levels); since the final cross group already has
    its 2^f blocks resident in VMEM, running the tail on each before the
    write-back deletes that pass. Level parameters (k_blockbit, k_bitpos)
    arrive via scalar prefetch so one compile per f serves every level.

    Reference role: the single-pass MSD recursion step of RADULS
    (dependency/Raduls/raduls.h:349-546) — do all the work you can while
    the data is resident.
    """
    rows, n_members, mb = _geometry(log_b)
    nb = 1 << f

    def kernel(params_ref, *refs):
        k_blockbit = params_ref[0]
        k_bitpos = params_ref[1]
        ins = refs[:n_arrays]
        outs = refs[n_arrays : 2 * n_arrays]
        scratch = refs[2 * n_arrays : 3 * n_arrays]
        sems = refs[3 * n_arrays]
        g = pl.program_id(0)

        def beta_of(b):
            return (g << f) | b

        for x in range(n_arrays):
            for b in range(nb):
                pltpu.make_async_copy(
                    ins[x].at[pl.ds(beta_of(b) * rows, rows), :],
                    scratch[x].at[pl.ds(b * rows, rows), :],
                    sems.at[x * nb + b],
                ).start()
        for x in range(n_arrays):
            for b in range(nb):
                pltpu.make_async_copy(
                    ins[x].at[pl.ds(beta_of(b) * rows, rows), :],
                    scratch[x].at[pl.ds(b * rows, rows), :],
                    sems.at[x * nb + b],
                ).wait()

        vals = [
            [scratch[x][b * rows : (b + 1) * rows, :] for b in range(nb)]
            for x in range(n_arrays)
        ]
        # Cross strides: block-index bits f-1 .. 0 (j = B*2^bitpos).
        for bitpos in range(f - 1, -1, -1):
            for b in range(nb):
                if (b >> bitpos) & 1:
                    continue
                pb = b | (1 << bitpos)
                lo_w = [vals[x][b] for x in range(n_arrays)]
                hi_w = [vals[x][pb] for x in range(n_arrays)]
                # Paired (one mask, both slots): tie-swap is consistent,
                # so ties-as-greater is safe even with payloads.
                less = _lex_less(hi_w[:n_words], lo_w[:n_words])
                take_min = ((beta_of(b) >> k_blockbit) & 1) == 0
                swap = ~(less ^ take_min)
                for x in range(n_arrays):
                    new_lo = jnp.where(swap, hi_w[x], lo_w[x])
                    new_hi = jnp.where(swap, lo_w[x], hi_w[x])
                    vals[x][b] = new_lo
                    vals[x][pb] = new_hi
        # Block-local tails (strides B/2 .. 1), permuted member layout.
        for b in range(nb):
            bit_k = ((beta_of(b) >> (k_bitpos - log_b)) & 1) == 1
            mem = [
                [
                    vals[x][b][8 * m : 8 * m + 8, :]
                    for m in range(n_members)
                ]
                for x in range(n_arrays)
            ]
            for s in range(log_b - 1, -1, -1):
                mem = _stage(
                    mem, n_arrays, n_words, mb, log_b, s, bit_k, log_b
                )
            for x in range(n_arrays):
                for m in range(n_members):
                    scratch[x][b * rows + 8 * m : b * rows + 8 * m + 8, :] = (
                        mem[x][m]
                    )
        for x in range(n_arrays):
            for b in range(nb):
                pltpu.make_async_copy(
                    scratch[x].at[pl.ds(b * rows, rows), :],
                    outs[x].at[pl.ds(beta_of(b) * rows, rows), :],
                    sems.at[x * nb + b],
                ).start()
        for x in range(n_arrays):
            for b in range(nb):
                pltpu.make_async_copy(
                    scratch[x].at[pl.ds(b * rows, rows), :],
                    outs[x].at[pl.ds(beta_of(b) * rows, rows), :],
                    sems.at[x * nb + b],
                ).wait()

    return kernel


# ---------------------------------------------------------------------------
# Tail: strides B/2 .. 1 of one merge level, permuted layout throughout.
# ---------------------------------------------------------------------------


def _tail_member_kernel(n_arrays: int, n_words: int, log_b: int = LOG_B):
    """k-bit position arrives via scalar prefetch: one compile serves all
    merge levels (same contract as pallas_sort._tail_kernel). Operates on
    blocks in permuted layout; k >= 2B means the region bit depends only on
    the block index — a traced SCALAR direction for every stage."""
    rows, n_members, mb = _geometry(log_b)

    def kernel(params_ref, *refs):
        k_bitpos = params_ref[0]
        ins, outs = refs[:n_arrays], refs[n_arrays:]
        beta = pl.program_id(0)
        bit_k = ((beta >> (k_bitpos - log_b)) & 1) == 1  # scalar bool
        mem = [
            [ins[x][8 * m : 8 * m + 8, :] for m in range(n_members)]
            for x in range(n_arrays)
        ]
        for s in range(log_b - 1, -1, -1):  # j = B/2 .. 1
            mem = _stage(
                mem, n_arrays, n_words, mb, log_b, s, bit_k, log_b
            )
        for x in range(n_arrays):
            for m in range(n_members):
                outs[x][8 * m : 8 * m + 8, :] = mem[x][m]

    return kernel
