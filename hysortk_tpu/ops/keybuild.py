"""Fused canonical k-mer key construction as a single Pallas kernel.

ops/kmer.py builds keys with ~20 XLA-level rolls/maps over the flat code
stream, each materializing an (N,)-intermediate in HBM. This kernel does the
whole derivation — sliding 16-base packs, forward words, crumb-reversal
twin, canonical select, validity sentinel — inside VMEM, one block at a
time with a one-row halo (the packers look at most K+14 < 128 elements
ahead), so HBM traffic drops to read-codes + write-keys.

Semantics are identical to ops/kmer.canonical_words + ops/sort.apply_sentinel
(tested against them); cite: reference Kmer<NLONGS> construction,
include/kmer.hpp:107-345.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sort import LANES, _roll  # shared Mosaic-safe roll helper
from . import pallas_sort

_FULL = np.uint32(0xFFFFFFFF)


def _shift_fwd(x: jnp.ndarray, t: int) -> jnp.ndarray:
    """shifted[i] = x[i + t] over the row-major (R, 128) view, t < 128.

    The last t elements wrap garbage; callers mask them via validity.
    """
    if t == 0:
        return x
    fwd = _roll(x, -t, 1)  # lanes
    fwd_next = _roll(fwd, -1, 0)  # rows
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < LANES - t, fwd, fwd_next)


def _crumb_reverse32(x: jnp.ndarray) -> jnp.ndarray:
    x = (x >> 16) | (x << 16)
    x = ((x & np.uint32(0xFF00FF00)) >> 8) | ((x & np.uint32(0x00FF00FF)) << 8)
    x = ((x & np.uint32(0xF0F0F0F0)) >> 4) | ((x & np.uint32(0x0F0F0F0F)) << 4)
    x = ((x & np.uint32(0xCCCCCCCC)) >> 2) | ((x & np.uint32(0x33333333)) << 2)
    return x


def load_codes_valid(codes_ref, valid_ref, scratch_c, scratch_v, sems, R):
    """In-kernel halo load: R+8 code rows + R validity rows into VMEM
    scratch (8-row halo keeps the DMA sublane-tile aligned; the packers
    look at most K+14 < 128 elements ahead). Shared by the standalone
    keybuild kernel and the fused keybuild+phase-A sort kernel
    (pallas_msort.block_sort_keybuild)."""
    b = pl.program_id(0)
    start = b * R
    pltpu.make_async_copy(
        codes_ref.at[pl.ds(start, R + 8), :], scratch_c, sems.at[0]
    ).start()
    pltpu.make_async_copy(
        valid_ref.at[pl.ds(start, R), :], scratch_v, sems.at[1]
    ).start()
    pltpu.make_async_copy(
        codes_ref.at[pl.ds(start, R + 8), :], scratch_c, sems.at[0]
    ).wait()
    pltpu.make_async_copy(
        valid_ref.at[pl.ds(start, R), :], scratch_v, sems.at[1]
    ).wait()


def derive_canonical(codes: jnp.ndarray, invalid: jnp.ndarray, k: int):
    """In-VMEM canonical key derivation over an (R+8, 128) uint32 code
    view: sliding 16-base packs, forward words, crumb-reversal twin,
    canonical select, validity sentinel. Returns W (R, 128) uint32 values
    (the kernel-side twin of ops/kmer.canonical_words +
    ops/sort.apply_sentinel; reference Kmer construction,
    include/kmer.hpp:107-345).
    """
    w_count = (k + 15) // 16
    r_last = k - 16 * (w_count - 1)
    R = invalid.shape[0]

    # Sliding 16-base pack (4 doubling steps).
    p = codes
    p = (p << 2) | _shift_fwd(p, 1)
    p = (p << 4) | _shift_fwd(p, 2)
    p = (p << 8) | _shift_fwd(p, 4)
    p = (p << 16) | _shift_fwd(p, 8)

    # Forward words.
    fwd = []
    for w in range(w_count):
        word = p if w == 0 else _shift_fwd(p, 16 * w)
        if w == w_count - 1 and r_last < 16:
            word = word & np.uint32(
                (0xFFFFFFFF << (32 - 2 * r_last)) & 0xFFFFFFFF
            )
        fwd.append(word)

    # Twin via crumb reversal + complement + multiword left shift.
    rev = [~_crumb_reverse32(fwd[w_count - 1 - w]) for w in range(w_count)]
    shift = 32 * w_count - 2 * k
    if shift == 0:
        twn = rev
    else:
        twn = []
        for w in range(w_count):
            hi = rev[w] << shift
            lo = (
                rev[w + 1] >> (32 - shift)
                if w + 1 < w_count
                else jnp.zeros_like(rev[w])
            )
            twn.append(hi | lo)

    # Canonical = lexicographic min(fwd, twn).
    less = jnp.zeros(codes.shape, dtype=jnp.bool_)
    eq = jnp.ones(codes.shape, dtype=jnp.bool_)
    for fw, tw in zip(fwd, twn):
        less = less | (eq & (tw < fw))
        eq = eq & (tw == fw)
    canon = [jnp.where(less, tw, fw) for fw, tw in zip(fwd, twn)]
    return [jnp.where(invalid, _FULL, c[:R, :]) for c in canon]


def _keybuild_kernel(k: int, block_rows: int):
    w_count = (k + 15) // 16
    R = block_rows

    def kernel(codes_ref, valid_ref, *out_refs):
        scratch_c, scratch_v, sems = out_refs[w_count:]
        outs = out_refs[:w_count]
        load_codes_valid(codes_ref, valid_ref, scratch_c, scratch_v, sems, R)
        canon = derive_canonical(
            scratch_c[:].astype(jnp.uint32), scratch_v[:] == 0, k
        )
        for o, c in zip(outs, canon):
            o[:] = c

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "block_rows"))
def canonical_keys_fused(
    codes: jnp.ndarray, valid: jnp.ndarray, k: int, block_rows: int = 256
) -> list[jnp.ndarray]:
    """codes (N,) int8, valid (N,) bool -> W sentinel-marked key word arrays.

    N must be a multiple of block_rows*128 plus one spare row's worth of
    padding is assumed present (the host flattener always pads >= 16 and the
    caller rounds N to the block; the final halo row is read from within the
    array thanks to an extra appended row).
    """
    n = codes.shape[0]
    w_count = (k + 15) // 16
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    extra = 8 * LANES  # 8-row halo
    codes_p = jnp.concatenate(
        [codes.astype(jnp.int32), jnp.zeros(n_pad - n + extra, jnp.int32)]
    )
    valid_p = jnp.concatenate(
        [valid, jnp.zeros(n_pad - n, dtype=valid.dtype)]
    ).astype(jnp.int32)

    codes2d = codes_p.reshape(-1, LANES)
    valid2d = valid_p.reshape(-1, LANES)
    n_blocks = n_pad // block

    out = pl.pallas_call(
        _keybuild_kernel(k, block_rows),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_rows, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
            )
        ]
        * w_count,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.uint32)
        ]
        * w_count,
        scratch_shapes=[
            pltpu.VMEM((block_rows + 8, LANES), jnp.int32),
            pltpu.VMEM((block_rows, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=pallas_sort._INTERPRET,
    )(codes2d, valid2d)
    return [o.reshape(n_pad)[:n] for o in out]
