"""End-to-end pipeline with sort_backend='pallas' (interpret on CPU)."""

import numpy as np
import pytest

from hysortk_tpu import KmerConfig, count_reads
from hysortk_tpu.io import fasta as fasta_io
from hysortk_tpu.ops import pallas_sort
from hysortk_tpu import testing as oracle

pallas_sort.set_interpret(True)


def test_pipeline_with_pallas_sort_matches_oracle():
    rng = np.random.default_rng(55)
    reads = oracle.random_reads(rng, 30, 35, 80)
    reads = reads + reads[:12]
    cfg = KmerConfig(
        k=31, m=17, lower=2, upper=50, sort_backend="pallas", pad_multiple=256
    )
    codes, lengths = fasta_io.reads_to_codes(reads)
    kmerlist, hist = count_reads(codes, lengths, cfg)
    want = {
        k.encode(): v
        for k, v in oracle.oracle_filtered(reads, 31, 2, 50).items()
    }
    assert kmerlist.as_dict() == want

    # Cross-check against the XLA backend.
    cfg_xla = KmerConfig(k=31, m=17, lower=2, upper=50, pad_multiple=256)
    xla_list, xla_hist = count_reads(codes, lengths, cfg_xla)
    assert kmerlist.as_dict() == xla_list.as_dict()
    assert np.array_equal(hist, xla_hist)


def test_sort_codes_fused_matches_unfused():
    """Keybuild fused into phase A (pallas_sort.sort_codes_fused) must be
    element-identical to canonical_keys_fused + lax.sort across word
    widths and multi-block sizes (interpret mode, 16-row blocks)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hysortk_tpu.ops import keybuild, pallas_sort

    prev = pallas_sort._INTERPRET
    pallas_sort.set_interpret(True)
    rng = np.random.default_rng(83)
    try:
        for k, n in ((15, 2048), (31, 5000), (55, 4096)):
            codes = rng.integers(0, 4, size=n).astype(np.int8)
            valid = rng.random(n) < 0.9
            valid[-(k - 1):] = False
            got = pallas_sort.sort_codes_fused(
                jnp.asarray(codes), jnp.asarray(valid), k
            )
            marked = keybuild.canonical_keys_fused(
                jnp.asarray(codes), jnp.asarray(valid), k
            )
            want = jax.lax.sort(
                tuple(marked), num_keys=len(marked), is_stable=False
            )
            for g, w in zip(got, want):
                np.testing.assert_array_equal(
                    np.asarray(g), np.asarray(w), err_msg=f"k={k} n={n}"
                )
    finally:
        pallas_sort.set_interpret(prev)
