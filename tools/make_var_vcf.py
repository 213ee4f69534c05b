#!/usr/bin/env python3
"""Generate tests/data/small/var.vcf: het/hom SNVs placed under known reads
of the small test set (exact/mult/mm/splice) to exercise vA/vG/vW paths."""
import os

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
fa = os.path.join(root, "tests/data/small/genome.fa")
seqs, name = {}, None
for line in open(fa):
    if line.startswith(">"):
        name = line[1:].split()[0]
        seqs[name] = []
    else:
        seqs[name].append(line.strip())
seqs = {k: "".join(v) for k, v in seqs.items()}
ALT = {"A": "G", "C": "T", "G": "A", "T": "C"}
OTHER = {"A": "C", "C": "G", "G": "T", "T": "A"}

rows = []
def snp(chrom, pos1, gt, alt=None, fmt_extra=""):
    ref = seqs[chrom][pos1 - 1]
    a = alt or ALT[ref]
    rows.append((chrom, pos1, ".", ref, a, "100", "PASS", ".", "GT",
                 gt + fmt_extra))

snp("chr1", 30150, "0|1")            # exact0 read (30101-30200): vW=1 path
snp("chr1", 44700, "1|0")            # exact1 (-) read: strand conversion
snp("chr1", 44710, "0|1", fmt_extra=":PS")  # FORMAT extras after ':'
snp("chr1", 5190, "0|1")             # mult0+mult1 reads: vW=2
snp("chr1", 19600, "1|1")            # homozygous: var-only, excluded by WASP
for i in range(11):                   # 11 SNPs on exact4 (11148-11247): vW=7
    snp("chr1", 11150 + 3 * i, "0|1")
# SNP where read base != both alleles (igt=3): mm read mm21 at 37263-37362
# has mismatches; pick a position and set ref/alt to two bases that are
# both != read base only if a mismatch lands there -- instead use alt=OTHER
# at a matching position so read==ref==nt[1] under 0|1 -> igt=1, and also
# one where alt bases differ from read (1|2-style multi-allelic):
rows.append(("chr1", 20850, ".", seqs["chr1"][20849],
             ALT[seqs["chr1"][20849]] + "," + OTHER[seqs["chr1"][20849]],
             "100", "PASS", ".", "GT", "1|2"))  # exact16 (20808-20907)
snp("chr2", 10100, "0|1")            # mult0 third locus on chr2
snp("chr1", 2, "0|1")                # uncovered: no read overlap
rows.sort(key=lambda r: (r[0], r[1]))

out = os.path.join(root, "tests/data/small/var.vcf")
with open(out, "w") as f:
    f.write("##fileformat=VCFv4.2\n")
    f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n")
    for r in rows:
        f.write("\t".join(str(x) for x in r) + "\n")
print("wrote", out, len(rows), "records")
