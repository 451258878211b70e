"""Supermer wire format: encode/decode round-trips and count preservation."""

import jax.numpy as jnp
import numpy as np
from collections import Counter

from hysortk_tpu import KmerConfig
from hysortk_tpu.io import fasta as fasta_io
from hysortk_tpu.io import supermer as sm
from hysortk_tpu.ops import minimizer
from hysortk_tpu.pipeline import count_flat
from hysortk_tpu import testing as oracle


def _prep(reads, cfg, num_buckets):
    codes, lengths = fasta_io.reads_to_codes(reads)
    flat, valid = fasta_io.flatten_for_device(codes, lengths, cfg.k, 128)
    dest = np.asarray(
        minimizer.kmer_destinations(
            jnp.asarray(flat, jnp.int32), cfg.k, cfg.m, num_buckets
        )
    )
    return flat, valid, dest


def test_roundtrip_preserves_kmer_multiset():
    rng = np.random.default_rng(41)
    reads = oracle.random_reads(rng, 30, 40, 200) * 2
    cfg = KmerConfig(k=31, m=17, lower=1, upper=65535)
    nb = 5
    flat, valid, dest = _prep(reads, cfg, nb)
    batches = sm.encode_supermers(flat, valid, dest, cfg.k, nb)

    # Total kmers preserved.
    assert sum(b.num_kmers(cfg.k) for b in batches) == int(valid.sum())

    # Decoding every bucket and counting must equal the direct count.
    merged = Counter()
    for b in batches:
        dcodes, dvalid = sm.decode_supermers(b, cfg.k)
        if dcodes.size == 0:
            continue
        pad = 128 - (dcodes.size % 128)
        dcodes = np.concatenate([dcodes, np.zeros(pad, np.uint8)])
        dvalid = np.concatenate([dvalid, np.zeros(pad, bool)])
        kl, _ = count_flat(dcodes.astype(np.int8), dvalid, cfg)
        merged.update(kl.as_dict())
    want = {
        k.encode(): v for k, v in oracle.oracle_counts(reads, cfg.k).items()
    }
    assert dict(merged) == want


def test_long_runs_respect_cap():
    # One long read with a single repeated base pattern -> long same-dest runs.
    reads = ["ACGT" * 300]  # 1200 bases
    cfg = KmerConfig(k=31, m=17, lower=1, upper=65535)
    flat, valid, dest = _prep(reads, cfg, 1)
    batches = sm.encode_supermers(flat, valid, dest, cfg.k, 1)
    assert int(batches[0].lengths.max()) <= sm.MAX_SUPERMER_LEN
    assert batches[0].num_kmers(cfg.k) == int(valid.sum())


def test_compression_beats_raw_keys():
    rng = np.random.default_rng(43)
    reads = oracle.random_reads(rng, 20, 150, 250)
    cfg = KmerConfig(k=31, m=17, lower=1, upper=65535)
    nb = 4
    flat, valid, dest = _prep(reads, cfg, nb)
    batches = sm.encode_supermers(flat, valid, dest, cfg.k, nb)
    stats = sm.supermer_stats(batches, cfg.k, cfg.words)
    assert stats["compression"] > 2.0, stats


def test_empty():
    batches = sm.encode_supermers(
        np.zeros(0, np.int8), np.zeros(0, bool), np.zeros(0, np.int32), 31, 3
    )
    assert len(batches) == 3
    for b in batches:
        c, v = sm.decode_supermers(b, 31)
        assert c.size == 0 and v.size == 0
