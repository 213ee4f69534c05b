#!/usr/bin/env python3
"""Generate a STARsolo stress dataset: overlapping genes (multi-gene reads
for --soloMultiMappers / --soloUMIfiltering) and engineered UMI families
whose collapse differs across every --soloUMIdedup mode.

Writes tests/data/solo3/: genome.fa, annot.gtf, wl.txt, cdna.fastq, bc.fastq.
Goldens come from the reference binary (tools/make_goldens.sh).
"""
import os
import numpy as np

NT = np.array(list("ACGT"))
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "solo3")
L = 80          # cDNA read length
CBL, UMIL = 16, 12


def seq_of(rng, n):
    return "".join(NT[rng.integers(0, 4, size=n)])


def umi_str(v):
    return "".join("ACGT"[(v >> (2 * (UMIL - 1 - i))) & 3] for i in range(UMIL))


def main():
    rng = np.random.default_rng(20250818)
    os.makedirs(OUT, exist_ok=True)
    chr1 = seq_of(rng, 20000)
    chr2 = seq_of(rng, 15000)
    with open(os.path.join(OUT, "genome.fa"), "w") as f:
        for name, s in (("chr1", chr1), ("chr2", chr2)):
            f.write(f">{name}\n")
            for i in range(0, len(s), 70):
                f.write(s[i:i + 70] + "\n")

    # G1 chr1:1001-3000 (+), G2 chr1:2001-4000 (+) overlap 2001-3000
    # G3 chr2:1001-2000 (+), G4 chr2:5001-6000 (-)
    genes = [("G1", "chr1", 1001, 3000, "+"), ("G2", "chr1", 2001, 4000, "+"),
             ("G3", "chr2", 1001, 2000, "+"), ("G4", "chr2", 5001, 6000, "-")]
    with open(os.path.join(OUT, "annot.gtf"), "w") as f:
        for (g, c, s, e, st) in genes:
            f.write(f'{c}\ttest\tgene\t{s}\t{e}\t.\t{st}\t.\tgene_id "{g}";\n')
            f.write(f'{c}\ttest\ttranscript\t{s}\t{e}\t.\t{st}\t.\tgene_id "{g}"; transcript_id "{g}.1";\n')
            f.write(f'{c}\ttest\texon\t{s}\t{e}\t.\t{st}\t.\tgene_id "{g}"; transcript_id "{g}.1";\n')

    # whitelist: 12 CBs
    wl = sorted({seq_of(rng, CBL) for _ in range(12)})
    with open(os.path.join(OUT, "wl.txt"), "w") as f:
        f.write("".join(c + "\n" for c in wl))

    def gdna(chrom, pos0):
        s = chr1 if chrom == "chr1" else chr2
        return s[pos0:pos0 + L]

    reads = []  # (cdna_seq, cb, umi_value)

    def add(chrom, lo0, hi0, cb, umi_v, n=1):
        for _ in range(n):
            pos = int(rng.integers(lo0, hi0 - L))
            reads.append((gdna(chrom, pos), cb, umi_v))

    for icb, cb in enumerate(wl[:8]):  # 8 "cells"
        base = int(rng.integers(0, 1 << (2 * UMIL)))
        # --- G1-unique region (chr1 1000..1900 0-based): UMI chain A/B/C
        a = base
        b = a ^ (1 << 4)               # 1MM vs a
        c = b ^ (3 << 20)              # 1MM vs b, 2MM vs a
        add("chr1", 1000, 1920, cb, a, n=5)
        add("chr1", 1000, 1920, cb, b, n=2)
        add("chr1", 1000, 1920, cb, c, n=1)
        # an unrelated UMI pair u/v with equal counts (directional keeps both)
        u = base ^ (2 << 8) ^ (1 << 18)
        v = u ^ (2 << 0)
        add("chr1", 1000, 1920, cb, u, n=2)
        add("chr1", 1000, 1920, cb, v, n=2)
        # high-half 1MM pair (exercises the swapped-halves graph pass)
        w = base ^ (3 << 16)
        x = w ^ (1 << 22)
        add("chr1", 1000, 1920, cb, w, n=3)
        add("chr1", 1000, 1920, cb, x, n=1)
        # --- G2-unique region (chr1 3050..3900)
        add("chr1", 3050, 3920, cb, base ^ (1 << 2), n=3)
        add("chr1", 3050, 3920, cb, base ^ (2 << 6), n=1)
        # --- multi-gene overlap region (chr1 2050..2900): G1+G2
        m1 = base ^ (3 << 10)
        m2 = m1 ^ (1 << 12)            # 1MM vs m1
        add("chr1", 2050, 2920, cb, m1, n=3)
        add("chr1", 2050, 2920, cb, m2, n=1)
        # a UMI shared between unique G1 reads and multi-gene reads
        add("chr1", 2050, 2920, cb, a, n=2)
        # MultiGeneUMI conflict: same UMI on unique G1 AND unique G2 reads
        s1 = base ^ (2 << 14)
        add("chr1", 1000, 1920, cb, s1, n=3)
        add("chr1", 3050, 3920, cb, s1, n=1 + (icb % 3))  # ties for some cells
        # --- G3 unique reads
        add("chr2", 1000, 1920, cb, base ^ (1 << 9), n=2)
        # --- antisense reads (G4 is '-', reads sampled forward => AS)
        add("chr2", 5000, 5920, cb, base ^ (2 << 3), n=1)

    # CB with one mismatch vs wl[0] (tests posterior resolution)
    cb_mm = wl[0][:5] + ("A" if wl[0][5] != "A" else "C") + wl[0][6:]
    for _ in range(3):
        reads.append((gdna("chr1", int(rng.integers(1000, 1840))), cb_mm,
                      int(rng.integers(0, 1 << (2 * UMIL)))))
    # intergenic + unmapped reads
    for _ in range(4):
        reads.append((gdna("chr1", int(rng.integers(9000, 12000))), wl[1],
                      int(rng.integers(0, 1 << (2 * UMIL)))))
    for _ in range(2):
        reads.append((seq_of(rng, L), wl[2], int(rng.integers(0, 1 << (2 * UMIL)))))

    order = rng.permutation(len(reads))
    with open(os.path.join(OUT, "cdna.fastq"), "w") as fc, \
         open(os.path.join(OUT, "bc.fastq"), "w") as fb:
        for k, i in enumerate(order):
            (cd, cb, umi_v) = reads[i]
            fc.write(f"@r{k}\n{cd}\n+\n{'I' * len(cd)}\n")
            bcseq = cb + umi_str(umi_v)
            qual = "I" * CBL + "F" * UMIL
            fb.write(f"@r{k}\n{bcseq}\n+\n{qual}\n")
    print(f"wrote {len(reads)} reads to {OUT}")


if __name__ == "__main__":
    main()
