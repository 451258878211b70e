"""Multiword key sort backends.

The reference sorts KmerSeedStruct arrays with PARADIS (in-place parallel MSD
radix, dependency/Paradis/paradissort.hpp:36-215) or RADULS (out-of-place
cache-aware MSD radix, dependency/Raduls/raduls.h), chosen at runtime by free
memory (src/kmerops.cpp:1344-1379). On TPU the equivalents are:

  * "xla":    jax.lax.sort over the W uint32 key words (lexicographic via
              num_keys), the correctness-first baseline.
  * "pallas": on-chip radix sort (ops/radix.py), the performance path.

A leading `invalid` word (0 = valid, 1 = invalid) is always the primary key so
padding/masked slots sort to the tail regardless of key contents.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def sort_keys(
    invalid: jnp.ndarray,
    words: Sequence[jnp.ndarray],
    payloads: Sequence[jnp.ndarray] = (),
    backend: str = "xla",
) -> tuple[jnp.ndarray, list[jnp.ndarray], list[jnp.ndarray]]:
    """Sort by (invalid, words...) lexicographically, carrying payloads.

    Returns (sorted_invalid, sorted_words, sorted_payloads).
    """
    n_words = len(words)
    if backend == "pallas":
        from . import radix

        return radix.radix_sort_keys(invalid, list(words), list(payloads))
    operands = (invalid.astype(jnp.uint32), *words, *payloads)
    out = jax.lax.sort(operands, num_keys=1 + n_words, is_stable=False)
    return (
        out[0],
        list(out[1 : 1 + n_words]),
        list(out[1 + n_words :]),
    )
