"""Bitonic merge of pre-sorted equal-length runs (pure XLA).

The receiver side of the range exchange (parallel/exchange.py) holds S
already-sorted runs of length L — re-sorting them from scratch would repeat
the full O(N log^2 N) network the senders already paid for. Merging instead
enters the standard bitonic network at level 2L: log2(S) merge levels of
log2(run) compare-exchange stages each, every stage a dense
reshape + compare + select that XLA fuses — no gathers, no scatters.

This plays the role of the reference's receive-side sort_task over gathered
task data (src/kmerops.cpp:535-541, 1382-1407), exploiting that our exchange
delivers sorted runs (the reference's recv buffers are unsorted, so it has
no choice but a full radix sort).

Requirements: run length L and run count S are powers of two; runs are
ascending with all-ones sentinel padding (ops/sort.py) in the tail slots.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _lex_less(a_words, b_words):
    less = jnp.zeros(a_words[0].shape, dtype=jnp.bool_)
    eq = jnp.ones(a_words[0].shape, dtype=jnp.bool_)
    for aw, bw in zip(a_words, b_words):
        less = less | (eq & (aw < bw))
        eq = eq & (aw == bw)
    return less


def flip_odd_runs(arrays, s: int, run_len: int):
    """Reverse every odd run so consecutive run pairs form bitonic
    sequences — the orientation required to enter the bitonic network at
    region size 2*run_len. THE single definition shared by the XLA network
    below and the Pallas merge-level entry (pallas_sort.merge_runs): the
    two backends must agree on run orientation or a merge silently
    produces unsorted output on exactly one of them.
    """
    odd = (jnp.arange(s, dtype=jnp.int32) & 1).astype(jnp.bool_)

    def flip(a):
        a2 = a.astype(jnp.uint32).reshape(s, run_len)
        return jnp.where(odd[:, None], a2[:, ::-1], a2).reshape(-1)

    return [flip(a) for a in arrays]


def merge_sorted_runs(
    arrays: Sequence[jnp.ndarray], n_words: int, run_len: int
) -> list[jnp.ndarray]:
    """Merge S = N/run_len ascending sorted runs into one ascending array.

    arrays: W key-word arrays (lexicographic) followed by payload arrays,
    all 1-D uint32 of the same length N. Returns the merged arrays.

    Backend choice:
      * TPU, runs of >= one Pallas block: the sort's own merge-level
        kernels entered at region size 2*run_len (ops/pallas_sort.py) —
        the reshape network below tile-pads its (.., 2, j) views up to
        128/j x on TPU (measured: 36 GB padded for 800 MB of data), so it
        must never run there at scale.
      * TPU, short runs: lax.sort re-sort (small inputs; cost irrelevant).
      * CPU (tests / virtual meshes): the dense reshape network.
    """
    arrays = [a.astype(jnp.uint32) for a in arrays]
    n = arrays[0].shape[0]
    assert n % run_len == 0, (n, run_len)
    s = n // run_len
    assert run_len & (run_len - 1) == 0, run_len
    assert s & (s - 1) == 0, s
    if s == 1:
        return list(arrays)

    if jax.default_backend() == "tpu":
        from . import pallas_sort

        block = 512 * pallas_sort.LANES
        if run_len % block == 0:
            # Member formulation: permuted-layout tie-free tails + the
            # fused cross+tail pass (falls back to roll inside merge_runs
            # when the block geometry doesn't fit the member map).
            return pallas_sort.merge_runs(
                arrays, n_words, run_len, block_rows=512,
                formulation="member",
            )
        if run_len >= 8 * pallas_sort.LANES:
            rows = max(run_len // pallas_sort.LANES // 2, 8)
            if run_len % (rows * pallas_sort.LANES) == 0:
                return pallas_sort.merge_runs(
                    arrays, n_words, run_len, block_rows=rows,
                    formulation="member",
                )
        out = jax.lax.sort(tuple(arrays), num_keys=n_words, is_stable=False)
        return list(out)
    return _merge_network_xla(arrays, n_words, run_len)


def _merge_network_xla(
    arrays: list[jnp.ndarray], n_words: int, run_len: int
) -> list[jnp.ndarray]:
    """Dense reshape-formulated bitonic merge (CPU-friendly)."""
    n = arrays[0].shape[0]
    s = n // run_len

    arrays = flip_odd_runs(arrays, s, run_len)

    k = 2 * run_len
    while k <= n:
        j = k // 2
        while j >= 1:
            rows = n // (2 * j)
            views = [a.reshape(rows, 2, j) for a in arrays]
            a_half = [v[:, 0, :] for v in views]
            b_half = [v[:, 1, :] for v in views]
            # Region (size k) parity decides direction; the region index of
            # the row at global offset m*2j is (m*2j) // k.
            m = jnp.arange(rows, dtype=jnp.int32)
            desc = ((m * (2 * j) // k) & 1).astype(jnp.bool_)[:, None]
            cmp = _lex_less(b_half[:n_words], a_half[:n_words])
            swap = cmp ^ desc  # for desc this also swaps equals: harmless
            out = []
            for a, b in zip(a_half, b_half):
                new_a = jnp.where(swap, b, a)
                new_b = jnp.where(swap, a, b)
                out.append(
                    jnp.stack([new_a, new_b], axis=1).reshape(-1)
                )
            arrays = out
            j //= 2
        k *= 2
    return arrays
