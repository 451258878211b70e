"""2-bit packed read wire: host pack (io/supermer.py) <-> device decode
(ops/wire.py), and the packed multihost feeding path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hysortk_tpu import KmerConfig
from hysortk_tpu.io import fasta as fasta_io
from hysortk_tpu.io import supermer as supermer_io
from hysortk_tpu.ops import wire
from hysortk_tpu import testing as oracle


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(2)
    for n in (0, 1, 15, 16, 17, 1000):
        codes = rng.integers(0, 4, n).astype(np.int8)
        packed = supermer_io.pack_codes_2bit(codes)
        assert packed.nbytes <= (n + 15) // 16 * 4
        back = np.asarray(wire.unpack_codes(jnp.asarray(packed), n))
        assert np.array_equal(back, codes), n


def test_valid_from_lengths_matches_flattener():
    rng = np.random.default_rng(4)
    k = 31
    lengths = rng.integers(5, 120, 40).astype(np.int64)
    codes = rng.integers(0, 4, int(lengths.sum())).astype(np.int8)
    flat, valid = fasta_io.flatten_for_device(codes, lengths, k, 256)
    got = np.asarray(
        wire.valid_from_lengths(
            jnp.asarray(lengths.astype(np.int32)), k, flat.shape[0]
        )
    )
    assert np.array_equal(got, valid)
    # zero-padded lengths tail (the wire ships fixed-size arrays)
    padded = np.concatenate([lengths, np.zeros(7, np.int64)])
    got2 = np.asarray(
        wire.valid_from_lengths(
            jnp.asarray(padded.astype(np.int32)), k, flat.shape[0]
        )
    )
    assert np.array_equal(got2, valid)


def test_wire_density():
    """Wire bytes ~ bases/4 + 4 B/read — the reference's supermer wire
    density (2-bit payload + length array, src/kmerops.cpp:1096-1148)."""
    rng = np.random.default_rng(8)
    lengths = rng.integers(50, 150, 200).astype(np.int64)
    codes = rng.integers(0, 4, int(lengths.sum())).astype(np.int8)
    cfg = KmerConfig(k=31, m=17, pad_multiple=1024)
    from hysortk_tpu.parallel.pipeline import distribute_reads_packed

    packed, lens2d, block, _ = distribute_reads_packed(codes, lengths, cfg, 4)
    wire_bytes = packed.nbytes + lens2d.nbytes
    raw = codes.size  # int8 shipping
    # padding to pad_multiple dominates small inputs; bound generously
    assert wire_bytes < raw / 4 + lens2d.nbytes + 4 * 4 * cfg.pad_multiple / 4
    assert wire_bytes < raw  # strictly better than int8 + bool


@pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device (virtual CPU) mesh"
)
def test_packed_sharded_equals_unpacked():
    from hysortk_tpu.ops import mixkey
    from hysortk_tpu.parallel.mesh import make_mesh
    from hysortk_tpu.parallel import pipeline as sp
    from hysortk_tpu.pipeline import compact_keys

    rng = np.random.default_rng(19)
    reads = oracle.random_reads(rng, 40, 35, 90) * 2
    cfg = KmerConfig(k=31, m=17, lower=2, upper=50, pad_multiple=256)
    codes, lengths = fasta_io.reads_to_codes(reads)
    mesh = make_mesh(jax.devices())
    S = 8

    packed, lens2d, block, _ = sp.distribute_reads_packed(codes, lengths, cfg, S)
    capacity = sp.range_capacity(block, S, cfg)
    keys, cnt, keep, xw, xc, xk, totals, overflow = (
        sp._count_sharded_packed_jit(
            jnp.asarray(packed), jnp.asarray(lens2d.reshape(-1)),
            cfg=cfg, num_shards=S, capacity=capacity, block_len=block,
            mesh=mesh,
        )
    )
    assert int(np.asarray(overflow)) == 0
    # Per-destination totals (free from the segment offsets) must account
    # for every valid k-mer exactly once.
    n_valid = sum(
        max(l - cfg.k + 1, 0) for l in lengths.tolist()
    )
    assert int(np.asarray(totals).sum()) == n_valid
    keep_np = np.asarray(keep)
    got_keys = compact_keys(keys, keep_np)
    got_cnt = np.asarray(cnt)[keep_np]
    got_keys = mixkey.unmix_keys_np(got_keys)
    got = dict(
        zip(
            [bytes(x) for x in
             __import__("hysortk_tpu.ops.kmer", fromlist=["decode_keys"])
             .decode_keys(got_keys, cfg.k).tolist()],
            got_cnt.tolist(),
        )
    )
    want = {
        k.encode(): v
        for k, v in oracle.oracle_filtered(
            reads, cfg.k, cfg.lower, cfg.upper
        ).items()
    }
    assert got == want


def test_rid_pos_from_lengths_with_empty_reads():
    """Zero-length records must still advance the read id (matching the
    host flattener's global record numbering)."""
    k = 3
    lengths = np.array([5, 0, 6, 0, 0, 4], dtype=np.int64)
    codes = np.zeros(int(lengths.sum()), np.int8)
    flat, valid, rid, pos = fasta_io.flatten_for_device_ext(
        codes, lengths, k, 64, 7
    )
    lens_p = np.concatenate([lengths, np.zeros(3, np.int64)]).astype(np.int32)
    grid, gpos = wire.rid_pos_from_lengths(
        __import__("jax.numpy", fromlist=["asarray"]).asarray(lens_p),
        flat.shape[0], 7,
    )
    grid, gpos = np.asarray(grid), np.asarray(gpos)
    assert np.array_equal(grid[valid], rid[valid])
    assert np.array_equal(gpos[valid], pos[valid])


def test_fill_run_meta_piecewise_fill():
    """Per-run {rid0, pos0} headers -> per-position (rid, pos): arbitrary
    (non-monotone) values, zero-length pad runs, tail padding."""
    import jax.numpy as jnp
    import numpy as np

    from hysortk_tpu.ops import wire

    lengths = np.asarray([5, 3, 0, 4, 0, 0], dtype=np.int32)
    rid0 = np.asarray([7, 2, 0, 9, 0, 0], dtype=np.int32)
    pos0 = np.asarray([10, 0, 0, 3, 0, 0], dtype=np.uint32)
    n = 16
    rid, pos = wire.fill_run_meta(
        jnp.asarray(lengths), jnp.asarray(rid0), jnp.asarray(pos0), n
    )
    rid, pos = np.asarray(rid), np.asarray(pos)
    # run 0: positions 0-4 -> rid 7, pos 10..14
    np.testing.assert_array_equal(rid[0:5], [7] * 5)
    np.testing.assert_array_equal(pos[0:5], [10, 11, 12, 13, 14])
    # run 1: positions 5-7 -> rid 2, pos 0..2
    np.testing.assert_array_equal(rid[5:8], [2] * 3)
    np.testing.assert_array_equal(pos[5:8], [0, 1, 2])
    # run 3 (after a zero-length run): positions 8-11 -> rid 9, pos 3..6
    np.testing.assert_array_equal(rid[8:12], [9] * 4)
    np.testing.assert_array_equal(pos[8:12], [3, 4, 5, 6])
