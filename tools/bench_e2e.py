"""End-to-end wall-time comparison: CLI FASTA->histogram vs the reference
binary on the same host (VERDICT round-2 item #9).

Unlike bench.py (device-resident steady state), this measures everything:
FASTA parse, host packing, H2D, count, histogram. Two phases so the TPU and
CPU runs don't contend:

  python tools/bench_e2e.py gen [--bases 536870912]   # write /tmp/e2e.fa
  python tools/bench_e2e.py ref                        # reference binary (CPU)
  python tools/bench_e2e.py tpu [--stream 134217728]   # our CLI on the chip
  python tools/bench_e2e.py report                     # merge -> E2E.json

K=31 M=17 L=2 U=50 everywhere (the golden-oracle build). The reference runs
single-rank with all OpenMP threads — the strongest single-host CPU config
this machine offers. Reference timing is parsed from its own logs
(fastaindex.cpp:297-302 parse rate; 'Overall kmer counting' span), ours from
wall clocks around the same stages.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FASTA = "/tmp/e2e.fa"
PART = "/tmp/e2e_parts.json"
K, M, L, U = 31, 17, 2, 50


def gen(total_bases: int, read_len: int = 1024, seed: int = 11,
        coverage: int = 8) -> None:
    """Reads sampled as random windows of a synthetic genome at ~`coverage`x
    depth — the workload shape real sequencing data has (most k-mers occur
    ~coverage times, which the [L,U] filter is FOR; an all-distinct random
    FASTA makes the filter drop everything and the distinct-key set as large
    as the input)."""
    rng = np.random.default_rng(seed)
    n_reads = total_bases // read_len
    genome_len = max(total_bases // coverage, read_len + 1)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, size=genome_len)]
    starts = rng.integers(0, genome_len - read_len, size=n_reads)
    idx = starts[:, None] + np.arange(read_len)[None, :]
    reads = genome[idx]
    nl = np.full((n_reads, 1), ord("\n"), dtype=np.uint8)
    payload = np.concatenate([reads, nl], axis=1)
    with open(FASTA, "wb") as f:
        for i in range(n_reads):
            f.write(b">r%d\n" % i)
            f.write(payload[i].tobytes())
    print(f"wrote {FASTA}: {n_reads} reads x {read_len} b "
          f"({total_bases/1e6:.0f} Mb, ~{coverage}x coverage of a "
          f"{genome_len/1e6:.0f} Mb genome)")


def run_ref() -> None:
    binary = os.path.join(
        REPO, ".oracle", f"hysortk_ref_K{K}_M{M}_L{L}_U{U}_E0"
    )
    assert os.path.exists(binary), binary
    sys.path.insert(0, REPO)
    from hysortk_tpu.io import fasta as fasta_io

    recs = fasta_io.load_or_build_fai(FASTA)
    total_bases = sum(r.length for r in recs)
    n_kmers = sum(max(r.length - K + 1, 0) for r in recs)
    outdir = "/tmp/e2e_ref_out"
    os.makedirs(outdir, exist_ok=True)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [binary, FASTA, outdir + "/"],
        capture_output=True, text=True, timeout=7200,
    )
    wall = time.perf_counter() - t0
    proc.check_returncode()
    mm = re.search(
        r"Overall kmer counting \(Excluding I/O\):\s*\n\s*"
        r"total time \(user seconds\): ([0-9.]+)", proc.stdout)
    count_s = float(mm.group(1)) if mm else None
    mp = re.search(r"([0-9.]+) Mbs/second", proc.stdout)
    parse_mbs = float(mp.group(1)) if mp else None
    part = {"ref": {
        "wall_seconds": wall,
        "count_seconds": count_s,
        "parse_mb_per_s": parse_mbs,
        "total_bases": int(total_bases),
        "total_kmers": int(n_kmers),
        "kmers_per_sec_wall": n_kmers / wall,
    }}
    _merge(part)
    print(json.dumps(part))


def run_tpu(stream: int, repeat: int = 1) -> None:
    outdir = "/tmp/e2e_tpu_out"
    os.makedirs(outdir, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    args = [sys.executable, "-m", "hysortk_tpu.cli", FASTA, outdir,
            "-k", str(K), "-m", str(M), "-l", str(L), "-u", str(U),
            "--fuse-keybuild", "--fuse-count", "--sort", "auto",
            "--device-compact", "--single-device"]
    if repeat > 1:
        args += ["--repeat", str(repeat)]
    if stream:
        args += ["--stream-batch-bases", str(stream)]
    t0 = time.perf_counter()
    proc = subprocess.run(args, capture_output=True, text=True,
                          timeout=7200, env=env, cwd=REPO)
    wall = time.perf_counter() - t0
    sys.stderr.write(proc.stdout[-3000:] + proc.stderr[-2000:])
    proc.check_returncode()
    # timer.report() lines: "  read_fasta: 1.234s"
    stages = dict(
        re.findall(r"^\s+(\w+): ([0-9.]+)s", proc.stdout, re.MULTILINE)
    )
    n_kmers = None
    mk = re.search(r"(\d+) filtered kmers", proc.stdout)
    if mk:
        n_kmers = int(mk.group(1))
    part = {"tpu": {
        "wall_seconds_incl_startup": wall,
        "stages_s": {k: float(v) for k, v in stages.items()},
        "stream_batch_bases": stream,
        "total_kmers": n_kmers,
    }}
    _merge(part)
    print(json.dumps(part))


def _merge(part: dict) -> None:
    data = {}
    if os.path.exists(PART):
        data = json.load(open(PART))
    data.update(part)
    json.dump(data, open(PART, "w"), indent=1)


def report() -> None:
    data = json.load(open(PART))
    ref, tpu = data["ref"], data["tpu"]
    # Comparable span: everything after process startup. Our CLI pays ~45 s
    # of JAX/plugin import + compile per fresh process, which a production
    # deployment pays once; report both with and without it.
    stages = tpu["stages_s"]
    tpu_pipeline = sum(stages.values())
    out = {
        "fasta_bases": ref["total_bases"],
        "fasta_kmers": ref["total_kmers"],
        "ref_wall_s": round(ref["wall_seconds"], 2),
        "ref_count_s": ref["count_seconds"],
        "ref_parse_mb_per_s": ref["parse_mb_per_s"],
        "tpu_wall_incl_startup_s": round(tpu["wall_seconds_incl_startup"], 2),
        "tpu_pipeline_s": round(tpu_pipeline, 2),
        "tpu_stages_s": stages,
        "wall_ratio_pipeline": round(ref["wall_seconds"] / tpu_pipeline, 2),
        "wall_ratio_incl_startup": round(
            ref["wall_seconds"] / tpu["wall_seconds_incl_startup"], 2),
    }
    # E2E.json at the repo root is the curated record (wall numbers +
    # decomposition + link measurements); the raw report lands next to it.
    path = os.path.join(REPO, "E2E_report.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out, indent=1))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=("gen", "ref", "tpu", "report"))
    ap.add_argument("--bases", type=int, default=512 * 1024 * 1024)
    # Default snaps the per-batch flat device size onto exactly 2^26: the
    # flattener pads to ceil((bases+16)/pad)*pad, so batch must be 2^26-16
    # (snap_batch_to_pow2_flat). The old 2^26-8192 default landed at
    # 67101696 — above the boundary, so lax.sort hit the 26% pow2 cliff
    # AND the member sort padded every batch to 2^27 (2x the work).
    ap.add_argument("--stream", type=int, default=(1 << 26) - 16)
    ap.add_argument("--repeat", type=int, default=1)
    a = ap.parse_args()
    if a.phase == "gen":
        gen(a.bases)
    elif a.phase == "ref":
        run_ref()
    elif a.phase == "tpu":
        run_tpu(a.stream, a.repeat)
    else:
        report()


if __name__ == "__main__":
    main()
