#!/usr/bin/env bash
# Two-process jax.distributed smoke test on CPU: each process reads its
# base-balanced FASTA shard, the sharded pipeline runs over the global mesh,
# and process 0 checks the merged result against the brute-force oracle.
# This exercises the REAL multi-host code path (coordinator, per-host reads,
# make_array_from_process_local_data, DCN-style collectives) without a pod.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
PORT=${PORT:-45677}
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

python - "$TMP" <<'EOF'
import sys, numpy as np
tmp = sys.argv[1]
rng = np.random.default_rng(11)
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
reads = bases[rng.integers(0, 4, size=(120, 80))]
reads[-40:] = reads[:40]
with open(f"{tmp}/mp.fa", "wb") as f:
    for i, r in enumerate(reads):
        f.write(b">r%d\n" % i); f.write(r.tobytes()); f.write(b"\n")
EOF

run_proc() {
  JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=2" \
  python - "$TMP" "$PORT" "$1" <<'EOF'
import sys, os
tmp, port, pid = sys.argv[1], sys.argv[2], int(sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
sys.path.insert(0, "/root/repo")
from hysortk_tpu.config import KmerConfig
from hysortk_tpu.parallel import multihost

cfg = KmerConfig(k=31, m=17, lower=2, upper=50, pad_multiple=128)

# Wire-density assertion: the host->device feed must be the 2-bit packed
# format (~bases/4 payload + 4 B/read lengths), not int8 codes.
from hysortk_tpu.parallel.pipeline import distribute_reads_packed
codes_w, lengths_w = multihost.read_my_shard(f"{tmp}/mp.fa", cfg)
packed_w, lens_w, _, _ = distribute_reads_packed(codes_w, lengths_w, cfg, 2)
wire_bytes = packed_w.nbytes + lens_w.nbytes
budget = codes_w.size / 4 + lens_w.nbytes + 2 * cfg.pad_multiple
assert wire_bytes <= budget, (wire_bytes, budget)

kmerlist, hist = multihost.count_fasta_multihost(f"{tmp}/mp.fa", cfg)

# Union across processes via files (like the reference's per-rank outputs).
from hysortk_tpu.io import writer
writer.write_output_file(kmerlist, f"{tmp}/out", shard=pid)

# EXTENSION mode across 2 real processes: counts + (rid, pos) payloads.
cfg_ext = KmerConfig(k=31, m=17, lower=2, upper=50, extension=True,
                     pad_multiple=128)
kl_ext, hist_ext = multihost.count_fasta_multihost_ext(f"{tmp}/mp.fa", cfg_ext)
import json
ext_payload = {
    km.decode(): sorted((int(r), int(p)) for r, p in zip(rr.tolist(), pp.tolist()))
    for km, rr, pp in zip(kl_ext.decoded(), kl_ext.rid, kl_ext.pos)
}
with open(f"{tmp}/out/ext_{pid}.json", "w") as f:
    json.dump(ext_payload, f)

# Bounded-memory STREAMING across 2 real processes (non-EXT + EXT): tiny
# batches force several collective rounds; results must match one-shot.
kl_st, hist_st = multihost.count_fasta_multihost_streaming(
    f"{tmp}/mp.fa", cfg, batch_bases=1200
)
assert kl_st.as_dict() == kmerlist.as_dict(), "streaming != one-shot"
import numpy as np
assert np.array_equal(hist_st, hist)
kl_est, hist_est = multihost.count_fasta_multihost_ext_streaming(
    f"{tmp}/mp.fa", cfg_ext, batch_bases=1200
)
assert hist_est.tolist() == hist_ext.tolist()
est_payload = {
    km.decode(): sorted((int(r), int(p)) for r, p in zip(rr.tolist(), pp.tolist()))
    for km, rr, pp in zip(kl_est.decoded(), kl_est.rid, kl_est.pos)
}
assert est_payload == ext_payload, "EXT streaming != one-shot"

# Supermer routing across 2 real processes: the cross-host wire is the
# run format (lengths + 2-bit bases) moving inside one device all_to_all
# (reference exchange, src/kmerops.cpp:587-643). Assert both equality and
# the DCN byte density the format exists for.
from hysortk_tpu.parallel import supermer_route
from hysortk_tpu.io import fasta as fasta_io, supermer as supermer_io
cfg_sm = KmerConfig(k=31, m=17, lower=2, upper=50, routing="supermer",
                    pad_multiple=128)
kl_sm, hist_sm = supermer_route.count_fasta_multihost_supermer(
    f"{tmp}/mp.fa", cfg_sm
)
assert np.array_equal(hist_sm, hist), "supermer histogram != range routing"
sm_payload = {km.decode(): int(c)
              for km, c in zip(kl_sm.decoded(), kl_sm.counts)}
with open(f"{tmp}/out/sm_{pid}.json", "w") as f:
    json.dump(sm_payload, f)
# EXT over the supermer exchange: run headers ({len,pos,rid}) ride the
# all_to_all; payload union must match the range-routed EXT result.
cfg_sme = KmerConfig(k=31, m=17, lower=2, upper=50, routing="supermer",
                     extension=True, pad_multiple=128)
kl_sme, hist_sme = supermer_route.count_fasta_multihost_supermer(
    f"{tmp}/mp.fa", cfg_sme
)
assert np.array_equal(hist_sme, hist_ext)
sme_payload = {
    km.decode(): sorted((int(r), int(p)) for r, p in zip(rr.tolist(), pp.tolist()))
    for km, rr, pp in zip(kl_sme.decoded(), kl_sme.rid, kl_sme.pos)
}
with open(f"{tmp}/out/sme_{pid}.json", "w") as f:
    json.dump(sme_payload, f)

# Bounded supermer ROUNDS across 2 real processes (the reference's
# fixed-size supermer exchange rounds, src/kmerops.cpp:587-643): tiny
# batches force several collective rounds; equality vs one-shot.
kl_sms, hist_sms = supermer_route.count_fasta_multihost_supermer_streaming(
    f"{tmp}/mp.fa", cfg_sm, batch_bases=1200
)
assert np.array_equal(hist_sms, hist_sm), "supermer streaming histogram"
# Shard ownership may differ from the one-shot run (assignment comes from
# batch-0 sizes); compare the cross-process UNION at pid 0 instead.
with open(f"{tmp}/out/sms_{pid}.json", "w") as f:
    json.dump({km.decode(): int(c)
               for km, c in zip(kl_sms.decoded(), kl_sms.counts)}, f)

# EXT through the bounded supermer rounds across 2 real processes (the
# last routing x mode x scale matrix cell): run headers per batch, host
# merge of unfiltered occurrence partials; union vs one-shot EXT at pid 0.
kl_smes, hist_smes = supermer_route.count_fasta_multihost_supermer_streaming(
    f"{tmp}/mp.fa", cfg_sme, batch_bases=1200
)
assert np.array_equal(hist_smes, hist_ext), "supermer EXT streaming hist"
with open(f"{tmp}/out/smes_{pid}.json", "w") as f:
    json.dump({
        km.decode(): sorted((int(r), int(p))
                            for r, p in zip(rr.tolist(), pp.tolist()))
        for km, rr, pp in zip(kl_smes.decoded(), kl_smes.rid, kl_smes.pos)
    }, f)

# Density of this host's exchange stream: <= 2 bits/base + 4 B/supermer.
flat_c, flat_v = fasta_io.flatten_for_device(
    codes_w, lengths_w, cfg_sm.k, cfg_sm.pad_multiple
)
nb = 2 * cfg_sm.avg_buckets_per_shard * 2
dd = supermer_route.host_destinations(flat_c, cfg_sm.k, cfg_sm.m, nb)
sm_streams = supermer_io.encode_supermer_streams(
    flat_c, flat_v, dd % 4, cfg_sm.k, 4
)
sm_bases = sum(int(l.sum()) for _, l in sm_streams)
sm_n = sum(l.size for _, l in sm_streams)
assert supermer_route.wire_nbytes(sm_streams) <= sm_bases / 4 + 4 * sm_n + 8

from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("done-writing")

if pid == 0:
    from hysortk_tpu import testing as oracle
    from collections import Counter
    reads = []
    cur = None
    for line in open(f"{tmp}/mp.fa"):
        if line.startswith(">"):
            continue
        reads.append(line.strip())
    got = writer.parse_output_files(f"{tmp}/out")
    want = {k.encode(): v for k, v in oracle.oracle_filtered(reads, 31, 2, 50).items()}
    assert got == want, f"mismatch: {len(got)} vs {len(want)}"
    hist_d = {c: int(n) for c, n in enumerate(hist) if n > 0}
    assert hist_d == oracle.oracle_histogram(oracle.oracle_filtered(reads, 31, 2, 50))

    # EXT payload union across the two processes vs the occurrence oracle.
    ext_union = {}
    for p in (0, 1):
        with open(f"{tmp}/out/ext_{p}.json") as f:
            part = json.load(f)
        assert not (set(part) & set(ext_union)), "kmer owned by both shards"
        ext_union.update(part)
    occ = oracle.oracle_occurrences(reads, 31)
    expected_ext = {
        km: sorted(occ[km])
        for km in oracle.oracle_filtered(reads, 31, 2, 50)
    }
    got_ext = {km: [tuple(x) for x in v] for km, v in ext_union.items()}
    assert got_ext == expected_ext, (len(got_ext), len(expected_ext))

    # Supermer-routed union across processes vs the same oracle.
    sm_union = {}
    for p in (0, 1):
        with open(f"{tmp}/out/sm_{p}.json") as f:
            part = json.load(f)
        assert not (set(part) & set(sm_union)), "kmer owned by both shards"
        sm_union.update(part)
    assert {k.encode(): v for k, v in sm_union.items()} == want

    # Supermer STREAMING union across processes == the filtered oracle.
    sms_union = {}
    for p in (0, 1):
        with open(f"{tmp}/out/sms_{p}.json") as f:
            part = json.load(f)
        assert not (set(part) & set(sms_union)), "kmer owned by both shards"
        sms_union.update(part)
    assert {k.encode(): v for k, v in sms_union.items()} == want

    # Supermer EXT union must equal the range-routed EXT union exactly.
    sme_union = {}
    for p in (0, 1):
        with open(f"{tmp}/out/sme_{p}.json") as f:
            part = json.load(f)
        assert not (set(part) & set(sme_union)), "kmer owned by both shards"
        sme_union.update(part)
    got_sme = {km: [tuple(x) for x in v] for km, v in sme_union.items()}
    assert got_sme == expected_ext, (len(got_sme), len(expected_ext))

    # Supermer EXT STREAMING union must equal the one-shot EXT union too.
    smes_union = {}
    for p in (0, 1):
        with open(f"{tmp}/out/smes_{p}.json") as f:
            part = json.load(f)
        assert not (set(part) & set(smes_union)), "kmer owned by both shards"
        smes_union.update(part)
    got_smes = {km: [tuple(x) for x in v] for km, v in smes_union.items()}
    assert got_smes == expected_ext, (len(got_smes), len(expected_ext))
    print(f"MULTIPROCESS OK: {len(got)} kmers (+EXT payloads +streaming +supermer exchange +supermer EXT rounds), 2 processes x 2 devices", flush=True)
EOF
}

run_proc 1 &
W1=$!
run_proc 0
wait $W1
