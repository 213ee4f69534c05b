#!/usr/bin/env python3
"""At-scale correctness check: align the 100k-read chr20-scale bench dataset
and diff Aligned.out.sam + SJ.out.tab byte-for-byte against the reference
STAR binary's output on the same reads.

The tiny goldens cannot exercise the batched engine's envelope/escalation
boundaries (W/S/chain caps, ownership filter, record dedup); this run does.

Usage: python tools/at_scale_check.py [n_reads] [--host]
Builds the reference index/output on first use (cached under /tmp/ref_chr20).
"""
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
REF_BIN = "/root/reference/bin/Linux_x86_64/STAR"
REF_DIR = "/tmp/ref_chr20"


def ensure_reference(data, n_reads):
    idx = os.path.join(REF_DIR, "idx")
    out = os.path.join(REF_DIR, f"out{n_reads}/")
    if not os.path.exists(os.path.join(idx, "SA")):
        os.makedirs(idx, exist_ok=True)
        subprocess.run([REF_BIN, "--runMode", "genomeGenerate",
                        "--genomeDir", idx, "--genomeFastaFiles",
                        os.path.join(data, "genome.fa"),
                        "--runThreadN", "2",
                        "--outFileNamePrefix", REF_DIR + "/"], check=True)
    if not os.path.exists(out + "Aligned.out.sam"):
        os.makedirs(out, exist_ok=True)
        subprocess.run([REF_BIN, "--genomeDir", idx,
                        "--readFilesIn", os.path.join(data, "reads_se.fastq"),
                        "--runThreadN", "1", "--readMapNumber", str(n_reads),
                        "--outSAMunmapped", "Within",
                        "--outFileNamePrefix", out], check=True)
    return out


def body(path):
    with open(path) as f:
        return [l for l in f if not (l.startswith("@PG") or l.startswith("@CO"))]


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 \
        and sys.argv[1].isdigit() else 100000
    import bench
    data, idx = bench.ensure_dataset()
    ref_out = ensure_reference(data, n_reads)

    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    from star_tpu.genome.index import GenomeIndex
    gi = GenomeIndex.load(idx)
    out = f"/tmp/star_tpu_bench_chr20/scale{n_reads}/"
    os.makedirs(out, exist_ok=True)
    P = Parameters(["--genomeDir", idx,
                    "--readFilesIn", os.path.join(data, "reads_se.fastq"),
                    "--outFileNamePrefix", out,
                    "--outSAMunmapped", "Within",
                    "--readMapNumber", str(n_reads)])
    t0 = time.time()
    align_reads(P, gi=gi, use_device=(False if "--host" in sys.argv else None))
    print(f"star-tpu: {n_reads} reads in {time.time()-t0:.1f}s")

    ok = True
    a, b = body(out + "Aligned.out.sam"), body(ref_out + "Aligned.out.sam")
    if a != b:
        ok = False
        ndiff = sum(1 for x, y in zip(a, b) if x != y) + abs(len(a) - len(b))
        print(f"SAM MISMATCH: {ndiff} differing lines of {len(b)}")
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print(f"  first diff at line {i}:\n    ours: {x!r}\n    ref : {y!r}")
                break
    else:
        print(f"SAM identical ({len(a)} lines)")
    a = open(out + "SJ.out.tab").read()
    b = open(ref_out + "SJ.out.tab").read()
    if a != b:
        ok = False
        print("SJ MISMATCH")
    else:
        print("SJ identical")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
