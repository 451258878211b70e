"""Runtime utilities: logger, timer, memcheck, profiling, hashes, sort_decision."""

import io
import time

import numpy as np
import pytest

from hysortk_tpu.ops import hashes
from hysortk_tpu.ops.sort import sort_decision
from hysortk_tpu.runtime import memcheck, profiling
from hysortk_tpu.runtime.logger import Logger
from hysortk_tpu.runtime.timer import Timer


def test_logger_buffered_flush():
    out = io.StringIO()
    log = Logger(stream=out)
    log.log("line one")
    log.log("line two")
    log.flush("stage A")
    text = out.getvalue()
    assert "## stage A" in text
    assert "line one" in text and "line two" in text
    # Buffer cleared after flush.
    out2 = io.StringIO()
    log2 = Logger(stream=out2)
    log2.flush()
    assert "line" not in out2.getvalue()


def test_logger_root_prints_immediately():
    out = io.StringIO()
    Logger(stream=out).root("hello")
    assert out.getvalue() == "hello\n"


def test_timer_spans_accumulate():
    t = Timer()
    with t.span("work"):
        time.sleep(0.01)
    with t.span("work"):
        pass
    assert t.total("work") >= 0.01
    assert t.last("work") < 0.01
    assert "work" in t.report()


def test_memcheck_host_probes():
    assert memcheck.get_rss_gb() > 0
    assert memcheck.get_peak_rss_gb() >= memcheck.get_rss_gb() * 0.5
    assert memcheck.get_free_memory_kb() > 0


def test_memcheck_hbm_stats_on_cpu():
    # CPU backend may or may not report memory_stats; must not raise.
    memcheck.get_hbm_stats()
    memcheck.hbm_headroom_bytes()


def test_device_seconds_measures():
    import jax.numpy as jnp

    f = lambda x: jnp.sum(x * 2)
    sec = profiling.device_seconds(f, jnp.arange(1000.0))
    assert 0 <= sec < 5


def test_sort_decision_returns_valid_backend():
    assert sort_decision(1 << 20, 2) in ("xla", "pallas")


def test_auto_backend_flips_on_headroom(monkeypatch):
    """cfg.sort_backend == "auto" resolves via sort_decision: tight fake
    HBM headroom must flip the choice to the in-place-capable Pallas path
    (the reference's RADULS-vs-PARADIS rule, src/kmerops.cpp:1344-1379)."""
    from hysortk_tpu.ops import sort as sort_ops
    from hysortk_tpu.pipeline import resolved_cfg
    from hysortk_tpu.config import KmerConfig
    from hysortk_tpu.runtime import memcheck

    cfg = KmerConfig(k=31, m=17, lower=1, upper=50, sort_backend="auto")
    monkeypatch.setattr(memcheck, "hbm_headroom_bytes", lambda d=None: 1 << 40)
    assert resolved_cfg(cfg, 1 << 20).sort_backend == "xla"
    monkeypatch.setattr(memcheck, "hbm_headroom_bytes", lambda d=None: 1 << 20)
    assert resolved_cfg(cfg, 1 << 20).sort_backend == "pallas"
    # Non-auto configs pass through untouched.
    cfg_x = KmerConfig(k=31, m=17, lower=1, upper=50, sort_backend="xla")
    assert resolved_cfg(cfg_x, 1 << 20) is cfg_x
    # End-to-end: auto never reaches the jitted pipeline unresolved.
    import hysortk_tpu as H

    codes = np.asarray([0, 1, 2, 3] * 40, np.int8)
    lengths = np.asarray([160], np.int64)
    kl, _ = H.kmer_count(codes, lengths, cfg)
    assert len(kl) >= 0


def test_murmurhash3_64_known_vectors():
    # Self-consistency + avalanche sanity (no external vectors needed:
    # equality with the reference oracle is covered end-to-end elsewhere).
    h1 = hashes.murmurhash3_64(b"ACGTACGT")
    h2 = hashes.murmurhash3_64(b"ACGTACGA")
    assert h1 != h2
    assert h1 == hashes.murmurhash3_64(b"ACGTACGT")
    assert 0 <= h1 < (1 << 64)
    # Seed sensitivity.
    assert hashes.murmurhash3_64(b"ACGTACGT", seed=1) != h1
    # 16-byte block path + tail path.
    assert hashes.murmurhash3_64(b"A" * 16) != hashes.murmurhash3_64(b"A" * 17)


def test_wanghash64_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        x = int(rng.integers(0, 1 << 63))
        assert hashes.wanghash64_inv(hashes.wanghash64(x)) == x
    assert hashes.wanghash64(0) != 0


def test_snap_batch_to_pow2_flat():
    """Streaming batches sit exactly on pow2 flattened sizes (lax.sort pads
    to the next pow2 internally; crossing the boundary costs ~26%)."""
    from hysortk_tpu.runtime.scheduler import snap_batch_to_pow2_flat

    for batch, pad in ((1 << 26, 8192), (1 << 26, 1024), ((1 << 26) + 5, 1024),
                       (100000, 1024), (1 << 20, 256), (65000, 1024)):
        b = snap_batch_to_pow2_flat(batch, pad)
        assert b <= batch
        flat = -(-(b + 16) // pad) * pad
        assert flat & (flat - 1) == 0, (batch, pad, b, flat)
    # non-pow2 pad granularity: no snap, no crash
    assert snap_batch_to_pow2_flat(70000, 3000) == 70000


def test_suggest_pipe_depth_scales_with_width(monkeypatch):
    """Depth shrinks as key width grows (K=55 at depth 8 OOM'd a 16 GB
    chip; the rule replaces the manual 'use depth 3')."""
    from hysortk_tpu.runtime import memcheck
    from hysortk_tpu.runtime.scheduler import suggest_pipe_depth

    monkeypatch.setattr(
        memcheck, "hbm_headroom_bytes", lambda device=None: 14 * 1024**3
    )
    d2 = suggest_pipe_depth(1 << 26, 2)
    d4 = suggest_pipe_depth(1 << 26, 4)
    assert d2 == 8  # K=31 keeps the measured-best full window
    assert 1 <= d4 < d2  # K=55 scales down instead of OOMing
    # Tight memory never returns an invalid window.
    monkeypatch.setattr(
        memcheck, "hbm_headroom_bytes", lambda device=None: 1 << 28
    )
    assert suggest_pipe_depth(1 << 26, 4) == 1
    # max_depth caps (the sharded streaming loops use 4).
    monkeypatch.setattr(
        memcheck, "hbm_headroom_bytes", lambda device=None: 14 * 1024**3
    )
    assert suggest_pipe_depth(1 << 20, 2, max_depth=4) == 4
