"""Single-chip end-to-end k-mer counting pipeline.

The device computation mirrors the reference's three phases
(kmer_count, src/hysortk.cpp:36-95) collapsed into one fused jitted program:

  prepare  (canonical key construction; reference prepare_supermer)
  sort     (multiword key sort; reference sort_task / PARADIS / RADULS)
  count    (run-length + [L,U] filter + histogram; reference filter_kmer)

The multi-device version lives in parallel/pipeline.py; this module is both
the 1-chip fast path and the correctness anchor for everything else.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import KmerConfig
from .ops import count as count_ops
from .ops import kmer as kmer_ops
from .ops import sort as sort_ops


@dataclasses.dataclass
class KmerList:
    """Filtered {kmer, count} result on host.

    keys:   (M, W) uint32 packed canonical keys
    counts: (M,) int32 frequencies, all within [lower, upper]
    Analogue of the reference's KmerListS (include/kmer.hpp:348-360).
    """

    keys: np.ndarray
    counts: np.ndarray
    k: int

    def __len__(self) -> int:
        return int(self.keys.shape[0])

    def decoded(self) -> np.ndarray:
        return kmer_ops.decode_keys(self.keys, self.k)

    def as_dict(self) -> dict[bytes, int]:
        return dict(zip(self.decoded().tolist(), self.counts.tolist()))


@functools.partial(jax.jit, static_argnames=("k", "lower", "upper", "sort_backend"))
def _count_device(
    codes: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    lower: int,
    upper: int,
    sort_backend: str,
):
    """codes (N,) int8, valid (N,) bool -> sorted keys, counts, keep mask, hist."""
    words = kmer_ops.canonical_words(codes.astype(jnp.int32), k)
    invalid = (~valid).astype(jnp.uint32)
    inv_s, words_s, _ = sort_ops.sort_keys(invalid, words, backend=sort_backend)
    svalid = inv_s == 0
    head, cnt = count_ops.run_length_count(svalid, words_s)
    keep = count_ops.frequency_filter(head, cnt, lower, upper)
    hist = count_ops.histogram(keep, cnt, upper)
    keys = jnp.stack(words_s, axis=-1)
    return keys, cnt, keep, hist


def count_flat(
    codes: np.ndarray, valid: np.ndarray, cfg: KmerConfig
) -> tuple[KmerList, np.ndarray]:
    """Count canonical k-mers of a flat device batch. Returns (list, histogram)."""
    keys, cnt, keep, hist = _count_device(
        jnp.asarray(codes, dtype=jnp.int8),
        jnp.asarray(valid),
        cfg.k,
        cfg.lower,
        cfg.upper,
        cfg.sort_backend,
    )
    keep_np = np.asarray(keep)
    kmerlist = KmerList(
        keys=np.asarray(keys)[keep_np],
        counts=np.asarray(cnt)[keep_np],
        k=cfg.k,
    )
    return kmerlist, np.asarray(hist)


def count_reads(
    codes: np.ndarray,
    lengths: np.ndarray,
    cfg: KmerConfig,
) -> tuple[KmerList, np.ndarray]:
    """Full single-chip pipeline from packed host reads."""
    from .io import fasta as fasta_io

    flat, valid = fasta_io.flatten_for_device(
        codes, lengths, cfg.k, cfg.pad_multiple
    )
    return count_flat(flat, valid, cfg)
