#!/usr/bin/env python3
"""Profile the end-to-end bench workload (host-phase breakdown + cProfile).

Usage: STAR_TPU_TIMING=1 python tools/profile_bench.py [n_reads] [--cprofile]
"""
import cProfile
import os
import pstats
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    do_prof = "--cprofile" in sys.argv
    data, idx = bench.ensure_dataset()
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    from star_tpu.genome.index import GenomeIndex
    gi = GenomeIndex.load(idx)
    P = Parameters(["--genomeDir", idx,
                    "--readFilesIn", os.path.join(data, "reads_se.fastq"),
                    "--outFileNamePrefix", "/tmp/star_tpu_bench_chr20/prof/",
                    "--outSAMunmapped", "Within",
                    "--readMapNumber", str(n)])
    os.makedirs("/tmp/star_tpu_bench_chr20/prof", exist_ok=True)

    from star_tpu.ops.pipeline import DeviceAligner, TIMERS, timing_report
    tw = time.time()
    DeviceAligner(gi, P).warm_buckets(102)
    print(f"[warm_buckets: {time.time()-tw:.0f}s]", flush=True)
    tw = time.time()
    Pw = P.clone(readMapNumber=3000,
                 outFileNamePrefix="/tmp/star_tpu_bench_chr20/warm/")
    os.makedirs("/tmp/star_tpu_bench_chr20/warm", exist_ok=True)
    align_reads(Pw, gi=gi)
    print(f"[warm runs: {time.time()-tw:.0f}s]", flush=True)
    TIMERS.clear()

    t0 = time.time()
    if do_prof:
        pr = cProfile.Profile()
        pr.enable()
    stats = align_reads(P, gi=gi)
    if do_prof:
        pr.disable()
    dt = time.time() - t0
    print(f"\n=== {stats.read_n} reads in {dt:.1f}s = "
          f"{stats.read_n/dt:.0f} reads/s")
    print("phases:", timing_report())
    from star_tpu.ops.batch_engine import FB_STATS
    print("fallback causes:", dict(FB_STATS))
    if do_prof:
        pr.dump_stats("/tmp/prof.out")
        st = pstats.Stats(pr)
        st.sort_stats("cumulative").print_stats(35)
        st.sort_stats("tottime").print_stats(35)


if __name__ == "__main__":
    main()

# (fallback-cause reporting appended by round 4)
