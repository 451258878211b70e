"""Device-side 32-bit hash mixers.

The reference hashes minimizers/k-mers with MurmurHash3 x64-128
(reference: include/hashfuncs.hpp:9-16, src/hashfuncs.cpp:42-252). Hashes only
drive *distribution* (bucket ownership), never the counted output, so the TPU
build is free to use 32-bit mixers that map well onto the VPU instead of
emulating 64-bit multiplies. We use the murmur3 fmix32 finalizer as the mixing
primitive, combined across key words with the boost-style hash_combine round.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 32-bit finalizer: full-avalanche bijective mixer."""
    h = h.astype(_U32)
    h = h ^ (h >> 16)
    h = h * _U32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _U32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def mix_words(words: list[jnp.ndarray], seed: int = 313) -> jnp.ndarray:
    """Combine W uint32 words into one well-mixed uint32 hash.

    seed 313 kept as a nod to the reference's murmur seed
    (reference: src/hashfuncs.cpp murmurhash3 wrappers).
    """
    h = jnp.full(words[0].shape, _U32(seed & 0xFFFFFFFF))
    for w in words:
        h = h ^ fmix32(w.astype(_U32))
        h = h * _U32(0x9E3779B1) + _U32(0xE6546B64)
    return fmix32(h)
