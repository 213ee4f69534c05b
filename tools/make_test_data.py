#!/usr/bin/env python3
"""Generate small synthetic genomes + reads for golden tests.

Creates, under tests/data/<name>/:
  genome.fa           two-chromosome synthetic genome
  reads_se.fastq      single-end reads: exact, mismatch, indel, spliced, multimapper
  reads_pe_1.fastq / reads_pe_2.fastq  paired-end reads
  annot.gtf           annotation with the planted introns (for sjdb tests)

The reference aligner (run separately, see tools/make_goldens.sh) produces
golden SAM / SJ.out.tab outputs that our implementation must match.
"""
import argparse
import os
import numpy as np

NT = np.array(list("ACGT"))


def rc(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp[c] for c in reversed(s))


def make_genome(rng, chr_lens):
    chrs = {}
    for i, L in enumerate(chr_lens):
        seq = "".join(NT[rng.integers(0, 4, size=L)])
        chrs[f"chr{i+1}"] = seq
    return chrs


def plant_repeat(rng, chrs, src_chr, src_pos, dst_chr, dst_pos, L):
    """copy a segment to another locus to create multimappers"""
    s = chrs[src_chr][src_pos:src_pos + L]
    d = chrs[dst_chr]
    chrs[dst_chr] = d[:dst_pos] + s + d[dst_pos + L:]


def plant_intron(chrs, chrom, pos, intron_len, rng):
    """Force GT..AG motif at [pos, pos+intron_len) so the intron is canonical."""
    seq = chrs[chrom]
    body = "GT" + "".join(NT[rng.integers(0, 4, size=intron_len - 4)]) + "AG"
    chrs[chrom] = seq[:pos] + body + seq[pos + intron_len:]
    return pos, pos + intron_len  # intron: [start, end) 0-based


def write_fasta(path, chrs, width=70):
    with open(path, "w") as f:
        for name, seq in chrs.items():
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i:i + width] + "\n")


def mutate(read, rng, nmm=0, ins=None, dele=None):
    r = list(read)
    for _ in range(nmm):
        i = rng.integers(5, len(r) - 5)
        cur = r[i]
        choices = [c for c in "ACGT" if c != cur]
        r[i] = choices[rng.integers(0, 3)]
    if ins is not None:
        pos, L = ins
        r = r[:pos] + list("".join(NT[rng.integers(0, 4, size=L)])) + r[pos:]
    if dele is not None:
        pos, L = dele
        r = r[:pos] + r[pos + L:]
    return "".join(r)


def fastq_rec(name, seq, qual_char="I"):
    return f"@{name}\n{seq}\n+\n{qual_char * len(seq)}\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/data/small")
    ap.add_argument("--seed", type=int, default=20250817)
    ap.add_argument("--chr-lens", type=int, nargs="+", default=[60000, 40000])
    ap.add_argument("--n-reads", type=int, default=300)
    ap.add_argument("--read-len", type=int, default=100)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)

    chrs = make_genome(rng, args.chr_lens)
    # multimapper locus: identical 300bp segment on chr1 at two places + chr2
    plant_repeat(rng, chrs, "chr1", 5000, "chr1", 20000, 300)
    plant_repeat(rng, chrs, "chr1", 5000, "chr2", 10000, 300)
    # introns (canonical GT/AG) on chr1 and chr2
    introns = []
    introns.append(("chr1", *plant_intron(chrs, "chr1", 30000, 500, rng)))
    introns.append(("chr1", *plant_intron(chrs, "chr1", 40000, 2000, rng)))
    introns.append(("chr2", *plant_intron(chrs, "chr2", 20000, 800, rng)))

    write_fasta(os.path.join(args.out, "genome.fa"), chrs)

    # GTF with two-exon transcripts spanning each intron
    with open(os.path.join(args.out, "annot.gtf"), "w") as f:
        for i, (c, s, e) in enumerate(introns):
            gid = f"G{i+1}"
            ex1s, ex1e = s - 400, s          # 0-based half-open
            ex2s, ex2e = e, e + 400
            f.write(f'{c}\ttest\tgene\t{ex1s+1}\t{ex2e}\t.\t+\t.\tgene_id "{gid}";\n')
            f.write(f'{c}\ttest\ttranscript\t{ex1s+1}\t{ex2e}\t.\t+\t.\tgene_id "{gid}"; transcript_id "{gid}.1";\n')
            f.write(f'{c}\ttest\texon\t{ex1s+1}\t{ex1e}\t.\t+\t.\tgene_id "{gid}"; transcript_id "{gid}.1";\n')
            f.write(f'{c}\ttest\texon\t{ex2s+1}\t{ex2e}\t.\t+\t.\tgene_id "{gid}"; transcript_id "{gid}.1";\n')

    L = args.read_len
    reads = []

    def sample_exact(chrom, lo, hi, tag, n, nmm=0, ins=None, dele=None, frac_rev=0.5):
        seq = chrs[chrom]
        for i in range(n):
            extra = (ins[1] if dele else 0) if False else 0
            pos = int(rng.integers(lo, hi - L - 20))
            raw_len = L + (dele[1] if dele else 0) - (ins[1] if ins else 0)
            r = seq[pos:pos + raw_len]
            r = mutate(r, rng, nmm=nmm, ins=ins, dele=dele)
            if rng.random() < frac_rev:
                r = rc(r)
                strand = "-"
            else:
                strand = "+"
            reads.append((f"{tag}{i}_{chrom}_{pos}_{strand}", r))

    n = args.n_reads
    sample_exact("chr1", 100, 50000, "exact", n // 4)
    sample_exact("chr2", 100, 35000, "exact2", n // 8)
    sample_exact("chr1", 100, 50000, "mm2", n // 8, nmm=2)
    sample_exact("chr1", 100, 50000, "del3", n // 16, dele=(40, 3))
    sample_exact("chr1", 100, 50000, "ins2", n // 16, ins=(40, 2))
    # multimapping reads from the repeat
    sample_exact("chr1", 5010, 5290 - L + 20 + L, "mult", n // 8) if False else None
    for i in range(n // 8):
        pos = int(rng.integers(5000, 5300 - L))
        r = chrs["chr1"][pos:pos + L]
        if rng.random() < 0.5:
            r = rc(r)
        reads.append((f"mult{i}_chr1_{pos}", r))
    # spliced reads across planted introns
    for i in range(n // 4):
        c, s, e = introns[int(rng.integers(0, len(introns)))]
        left = int(rng.integers(20, L - 20))
        right = L - left
        pos = s - left
        r = chrs[c][pos:s] + chrs[c][e:e + right]
        if rng.random() < 0.5:
            r = rc(r)
        reads.append((f"splice{i}_{c}_{pos}", r))
    # unmappable (random) reads
    for i in range(n // 16):
        r = "".join(NT[rng.integers(0, 4, size=L)])
        reads.append((f"rand{i}", r))

    # shuffle so read classes interleave: any prefix of the file is
    # representative (a class-sorted file makes partial-file benchmarks
    # wildly misleading — easy exact reads first, multimappers last)
    perm = rng.permutation(len(reads))
    reads = [reads[i] for i in perm]

    with open(os.path.join(args.out, "reads_se.fastq"), "w") as f:
        for name, seq in reads:
            f.write(fastq_rec(name, seq))

    # paired-end: fragments of 250-400, mate2 = rc of fragment end
    pairs = []
    if True:
        for i in range(n // 2):
            c = "chr1" if rng.random() < 0.6 else "chr2"
            seq = chrs[c]
            flen = int(rng.integers(250, 400))
            if rng.random() < 0.3:  # spliced fragment
                cc, s, e = introns[int(rng.integers(0, len(introns)))]
                c = cc
                seq = chrs[c]
                left = int(rng.integers(50, flen - 50))
                pos = s - left
                frag = seq[pos:s] + seq[e:e + (flen - left)]
            else:
                pos = int(rng.integers(100, len(seq) - flen - 100))
                frag = seq[pos:pos + flen]
            m1 = mutate(frag[:L], rng, nmm=int(rng.integers(0, 3)))
            m2 = mutate(rc(frag[-L:]), rng, nmm=int(rng.integers(0, 3)))
            pairs.append((f"pe{i}_{c}_{pos}", m1, m2))

    perm = rng.permutation(len(pairs))
    pairs = [pairs[i] for i in perm]
    with open(os.path.join(args.out, "reads_pe_1.fastq"), "w") as f1, \
         open(os.path.join(args.out, "reads_pe_2.fastq"), "w") as f2:
        for name, m1, m2 in pairs:
            f1.write(fastq_rec(name, m1))
            f2.write(fastq_rec(name, m2))

    print(f"wrote test data to {args.out}: {len(reads)} SE reads, {n//2} PE pairs")


if __name__ == "__main__":
    main()
