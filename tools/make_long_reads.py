#!/usr/bin/env python3
"""Generate long (0.5-3 kb) spliced test reads from the small test genome
for the STARlong golden config (reference: STARlong binary,
COMPILE_FOR_LONG_READS, IncludeDefine.h:126-140)."""
import argparse
import os

import numpy as np

COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def load_fasta(path):
    seqs, name = {}, None
    for line in open(path):
        if line.startswith(">"):
            name = line[1:].split()[0]
            seqs[name] = []
        else:
            seqs[name].append(line.strip())
    return {k: "".join(v) for k, v in seqs.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", default="tests/data/small/genome.fa")
    ap.add_argument("--out", default="tests/data/small/reads_long.fastq")
    ap.add_argument("--n-reads", type=int, default=40)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    genome = load_fasta(args.genome)
    chrs = sorted(genome)
    rng = np.random.default_rng(args.seed)
    bases = np.array(list("ACGT"))

    with open(args.out, "w") as f:
        for i in range(args.n_reads):
            chrom = chrs[int(rng.integers(len(chrs)))]
            g = genome[chrom]
            n_exons = int(rng.integers(1, 4))
            exon_lens = rng.integers(150, 1200, size=n_exons)
            intron_lens = rng.integers(80, 4000, size=max(n_exons - 1, 0))
            span = int(exon_lens.sum() + intron_lens.sum())
            if span + 10 >= len(g):
                exon_lens = np.minimum(exon_lens, 300)
                intron_lens = np.minimum(intron_lens, 500)
                span = int(exon_lens.sum() + intron_lens.sum())
            start = int(rng.integers(0, len(g) - span - 1))
            pieces, pos = [], start
            for e in range(n_exons):
                pieces.append(g[pos:pos + int(exon_lens[e])])
                pos += int(exon_lens[e])
                if e < n_exons - 1:
                    pos += int(intron_lens[e])
            seq = list("".join(pieces))
            # ~0.3% substitutions
            nmm = max(1, int(len(seq) * 0.003))
            for p in rng.integers(0, len(seq), size=nmm):
                seq[int(p)] = str(bases[int(rng.integers(4))])
            # one small indel in half the reads
            if i % 2 == 0 and len(seq) > 400:
                p = int(rng.integers(100, len(seq) - 100))
                if i % 4 == 0:
                    del seq[p:p + int(rng.integers(1, 4))]
                else:
                    ins = "".join(bases[rng.integers(0, 4, int(rng.integers(1, 4)))])
                    seq[p:p] = list(ins)
            s = "".join(seq)
            if i % 5 == 4:  # some reverse-strand reads
                s = "".join(COMP[c] for c in reversed(s))
            f.write("@long%03d\n%s\n+\n%s\n" % (i, s, "I" * len(s)))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
