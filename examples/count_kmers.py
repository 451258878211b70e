"""Minimal end-to-end example: count 31-mers of a FASTA file.

    python examples/count_kmers.py reads.fa

Equivalent to the reference's standalone binary (standalone/main.cpp) with
K=31 M=17 L=2 U=50.
"""

import sys

import hysortk_tpu as hk


def main(fasta: str) -> None:
    cfg = hk.KmerConfig(k=31, m=17, lower=2, upper=50)

    codes, lengths = hk.read_dna_buffer(fasta)
    print(f"{lengths.size} reads, {codes.size} bases")

    kmerlist, hist = hk.kmer_count(codes, lengths, cfg)
    print(f"{len(kmerlist)} distinct 31-mers with count in [2, 50]")

    hk.print_kmer_histogram(hist)

    # First few entries, decoded.
    for kmer, count in list(kmerlist.as_dict().items())[:5]:
        print(kmer.decode(), count)


if __name__ == "__main__":
    main(sys.argv[1])
