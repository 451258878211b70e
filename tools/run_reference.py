"""Run the reference HySortK oracle binary and record its CPU throughput.

Produces baseline_cpu.json at the repo root: the reference's k-mers/s on this
machine (single rank, all OpenMP threads), which bench.py uses as the
vs_baseline denominator.

Usage: python tools/run_reference.py [--bases 20000000] [--read-len 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def generate_fasta(path: str, total_bases: int, read_len: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    n_reads = total_bases // read_len
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = bases[rng.integers(0, 4, size=(n_reads, read_len))]
    ndup = max(n_reads // 12, 1)
    reads[-ndup:] = reads[:ndup]
    with open(path, "wb") as f:
        for i in range(n_reads):
            f.write(b">r%d\n" % i)
            f.write(reads[i].tobytes())
            f.write(b"\n")
    return n_reads


def build_oracle(k=31, m=17, lo=2, hi=50) -> str:
    out = subprocess.run(
        [os.path.join(REPO, "tools", "build_reference.sh"),
         str(k), str(m), str(lo), str(hi)],
        capture_output=True, text=True, check=True,
    )
    return out.stdout.strip().splitlines()[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bases", type=int, default=20_000_000)
    ap.add_argument("--read-len", type=int, default=1024)
    ap.add_argument("--fasta", default=None, help="use an existing FASTA")
    args = ap.parse_args()

    binary = build_oracle()
    print(f"oracle: {binary}", file=sys.stderr)

    with tempfile.TemporaryDirectory() as tmp:
        if args.fasta:
            fasta = args.fasta
            n_reads = None
        else:
            fasta = os.path.join(tmp, "bench.fa")
            n_reads = generate_fasta(fasta, args.bases, args.read_len)
        # The reference requires a .fai; build it with our indexer.
        sys.path.insert(0, REPO)
        from hysortk_tpu.io import fasta as fasta_io

        recs = fasta_io.load_or_build_fai(fasta)
        total_bases = sum(r.length for r in recs)
        n_kmers = sum(max(r.length - 31 + 1, 0) for r in recs)

        outdir = os.path.join(tmp, "out")
        os.makedirs(outdir, exist_ok=True)
        proc = subprocess.run(
            [binary, fasta, outdir + "/"],
            capture_output=True, text=True, timeout=3600,
        )
        print(proc.stdout[-2000:], file=sys.stderr)
        proc.check_returncode()
        m = re.search(
            r"Overall kmer counting \(Excluding I/O\):\s*\n\s*"
            r"total time \(user seconds\): ([0-9.]+)",
            proc.stdout,
        )
        if not m:
            raise RuntimeError("could not parse reference timing")
        seconds = float(m.group(1))

    result = {
        "kmers_per_sec": n_kmers / seconds,
        "count_seconds": seconds,
        "total_bases": int(total_bases),
        "total_kmers": int(n_kmers),
        "machine": os.uname().nodename,
        "ncpu": os.cpu_count(),
        "binary": os.path.basename(binary),
    }
    out_path = os.path.join(REPO, "baseline_cpu.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
