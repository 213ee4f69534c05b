#!/usr/bin/env python3
"""Generate a CB_UMI_Complex (inDrop-style) STARsolo dataset.

Geometry: bc read = CB1(8-11bp, anchored read-start..adapter-start) +
ADAPTER(12bp) + CB2(8bp, adapter-end+1..+8) + UMI(6bp, adapter-end+9..+14)
+ tail. Exercises: multi-length whitelists, adapter Hamming anchoring,
exact/1MM/EditDist_2 matching, -11/-12/-21/-22 failure classes, N/homopolymer
UMIs (incl. the reference's umiL=0-at-ctor quirk where only all-A UMIs are
caught), and UMI dedup inside each cell.

Writes tests/data/soloC/: wl1.txt wl2.txt cdna.fastq bc.fastq (genome/gtf
reused from tests/data/solo3). Goldens from tools/make_goldens.sh.
"""
import os
import numpy as np

NT = np.array(list("ACGT"))
HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "data", "soloC")
D3 = os.path.join(HERE, "..", "tests", "data", "solo3")
L = 80
ADAPTER = "GAGTGATTGCTT"


def seq_of(rng, n):
    return "".join(NT[rng.integers(0, 4, size=n)])


def sub(rng, s, k):
    """k random substitutions"""
    s = list(s)
    for i in rng.choice(len(s), size=k, replace=False):
        s[i] = str(rng.choice([c for c in "ACGT" if c != s[i]]))
    return "".join(s)


def main():
    rng = np.random.default_rng(20260818)
    os.makedirs(OUT, exist_ok=True)
    genome = {}
    name = None
    with open(os.path.join(D3, "genome.fa")) as f:
        for line in f:
            if line.startswith(">"):
                name = line[1:].strip()
                genome[name] = []
            else:
                genome[name].append(line.strip())
    genome = {k: "".join(v) for k, v in genome.items()}

    # WL1: multi-length (8..11); WL2: fixed length 8
    wl1 = []
    for ln in (8, 9, 10, 11):
        for _ in range(3):
            wl1.append(seq_of(rng, ln))
    # a deliberate 1MM-ambiguous pair: two length-8 entries differing at one
    # position => a read with a third base there is 1MM from both (-3)
    amb = seq_of(rng, 8)
    amb2 = list(amb)
    amb_pos = 3
    amb2[amb_pos] = "ACGT"[("ACGT".index(amb[amb_pos]) + 1) % 4]
    wl1 += [amb, "".join(amb2)]
    wl2 = [seq_of(rng, 8) for _ in range(6)]
    with open(os.path.join(OUT, "wl1.txt"), "w") as f:
        f.write("".join(s + "\n" for s in wl1))
    with open(os.path.join(OUT, "wl2.txt"), "w") as f:
        f.write("".join(s + "\n" for s in wl2))

    def cdna(chrom, lo, hi):
        pos = int(rng.integers(lo, hi - L))
        return genome[chrom][pos:pos + L]

    def umi_str(v):
        return "".join("ACGT"[(v >> (2 * (6 - 1 - i))) & 3] for i in range(6))

    reads = []  # (cdna_seq, bc_seq)

    def add(cb1, cb2, umi, adapter=ADAPTER, n=1, region=("chr1", 1000, 1920)):
        for _ in range(n):
            tail = seq_of(rng, 4)
            reads.append((cdna(*region), cb1 + adapter + cb2 + umi + tail))

    cells = [(wl1[i], wl2[i % len(wl2)]) for i in (0, 3, 6, 9, 1, 4)]
    for icb, (cb1, cb2) in enumerate(cells):
        base = int(rng.integers(0, 1 << 12))
        a, b = umi_str(base), umi_str(base ^ (1 << 3))  # 1MM UMI pair
        c = umi_str(base ^ (2 << 6) ^ (1 << 0))
        add(cb1, cb2, a, n=4)
        add(cb1, cb2, b, n=2)
        add(cb1, cb2, c, n=1)
        add(cb1, cb2, c, n=2, region=("chr2", 1000, 1920))  # G3
        if icb % 2 == 0:
            add(cb1, cb2, umi_str(base ^ (3 << 8)), n=1,
                region=("chr2", 5050, 5950))  # G4 (- strand)

    cb1x, cb2x = cells[0]
    # 1MM in CB1 only (accepted under 1MM, rejected under Exact)
    add(sub(rng, cb1x, 1), cb2x, umi_str(100), n=2)
    # 1MM in CB2 only
    add(cb1x, sub(rng, cb2x, 1), umi_str(101), n=2)
    # 1MM in both CBs -> -12 noTooManyMM under 1MM
    add(sub(rng, cb1x, 1), sub(rng, cb2x, 1), umi_str(102), n=2)
    # 2 substitutions in CB1 -> noNoWLmatch under 1MM, match under EditDist_2
    add(sub(rng, cb1x, 2), cb2x, umi_str(103), n=2)
    # EditDist_2 del-variant: 'A' + cb1 with one base deleted (same length)
    add("A" + cb1x[:3] + cb1x[4:], cb2x, umi_str(104), n=2)
    # EditDist_2 ins-variant: base inserted, last base dropped
    add(cb1x[:5] + "T" + cb1x[5:-1], cb2x, umi_str(105), n=2)
    # 1MM-ambiguous CB1 (1MM from both amb entries) -> -3
    ambr = list(amb)
    ambr[amb_pos] = "ACGT"[("ACGT".index(amb[amb_pos]) + 2) % 4]
    add("".join(ambr), cb2x, umi_str(106), n=2)
    # adapter broken (3 mismatches) -> -21 noNoAdapter
    add(cb1x, cb2x, umi_str(107), adapter=sub(rng, ADAPTER, 3), n=2)
    # N in UMI -> -23 ; all-A UMI -> -24 (quirk) ; all-C UMI passes (quirk)
    add(cb1x, cb2x, "ACGNTA", n=1)
    add(cb1x, cb2x, "AAAAAA", n=1)
    add(cb1x, cb2x, "CCCCCC", n=1)
    # single N in CB2 (1MM N-handling), two Ns -> -2
    add(cb1x, cb2x[:4] + "N" + cb2x[5:], umi_str(108), n=2)
    add(cb1x, cb2x[:3] + "NN" + cb2x[5:], umi_str(109), n=1)
    # CB1 too short (7bp, < minLen 8) -> -11 noNoCB
    add(cb1x[:7], cb2x, umi_str(110), n=1)
    # unmapped cDNA read (random sequence)
    reads.append((seq_of(rng, L), cb1x + ADAPTER + cb2x + umi_str(111)
                  + seq_of(rng, 4)))

    order = rng.permutation(len(reads))
    with open(os.path.join(OUT, "cdna.fastq"), "w") as fc, \
         open(os.path.join(OUT, "bc.fastq"), "w") as fb:
        for i, ir in enumerate(order):
            cs, bs = reads[ir]
            fc.write(f"@readC{i}\n{cs}\n+\n{'I' * len(cs)}\n")
            qb = "".join("FI"[(j + i) % 2] for j in range(len(bs)))
            fb.write(f"@readC{i}\n{bs}\n+\n{qb}\n")
    print(f"soloC: {len(reads)} reads, wl1={len(wl1)} wl2={len(wl2)}")


if __name__ == "__main__":
    main()
