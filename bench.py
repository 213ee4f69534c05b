#!/usr/bin/env python3
"""Benchmark: end-to-end alignment throughput (reads/s/chip) on a
chromosome-scale (chr20-sized, 60 MB) synthetic genome with 100k reads, plus
the MMP seed-search kernel rate.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}

vs_baseline compares against reference STAR 2.7.11b single-thread mapping
speed measured on the SAME generated dataset in THIS container on first
run and cached (~3,300 reads/s; see ref_baseline()).  The north-star
target is >=5x a 32-core node.

Dataset + index are cached under /tmp/star_tpu_bench_chr20; a cold run pays
the one-time index build (~6 min: native C++ suffix sort + chunked SAi).
"""
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("STAR_TPU_TIMING", "1")

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

# reference STAR 2.7.11b, 1 thread, same dataset — measured in THIS
# container on first run and cached (a hardcoded number from a different
# box overstated the baseline ~5x in rounds 2-4)
REF_BIN = "/root/reference/bin/Linux_x86_64/STAR"
CHR_LENS = ("40000000", "20000000")
N_READS = 100000


def ref_baseline(data, tmp="/tmp/star_tpu_bench_chr20"):
    """reads/s of the reference binary, 1 thread, same reads; cached"""
    cache = os.path.join(tmp, "ref_baseline.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["reads_per_sec"]
    if not os.path.exists(REF_BIN):
        return 2630.0   # measured 2026-08 in-container, fallback only
    idx = os.path.join(tmp, "ref_idx")
    if not os.path.exists(os.path.join(idx, "SA")):
        os.makedirs(idx, exist_ok=True)
        subprocess.run([REF_BIN, "--runMode", "genomeGenerate",
                        "--genomeDir", idx, "--genomeFastaFiles",
                        os.path.join(data, "genome.fa"),
                        "--genomeSAindexNbases", "12",
                        "--runThreadN", "2"], check=True,
                       capture_output=True, timeout=1800)
    out = os.path.join(tmp, "ref_out")
    os.makedirs(out, exist_ok=True)
    t0 = time.time()
    subprocess.run([REF_BIN, "--genomeDir", idx, "--readFilesIn",
                    os.path.join(data, "reads_se.fastq"),
                    "--readMapNumber", str(N_READS), "--runThreadN", "1",
                    "--outSAMunmapped", "Within",
                    "--outFileNamePrefix", out + "/"], check=True,
                   capture_output=True, timeout=1800)
    rps = N_READS / (time.time() - t0)
    with open(cache, "w") as f:
        json.dump({"reads_per_sec": rps, "note":
                   "reference 2.7.11b, 1 thread, in-container"}, f)
    return rps


def ensure_dataset(tmp="/tmp/star_tpu_bench_chr20"):
    data = os.path.join(tmp, "data")
    idx = os.path.join(tmp, "idx")
    if not os.path.exists(os.path.join(data, "reads_se.fastq")):
        os.makedirs(tmp, exist_ok=True)
        subprocess.run([sys.executable,
                        os.path.join(ROOT, "tools", "make_test_data.py"),
                        "--out", data, "--n-reads", str(N_READS),
                        "--chr-lens", *CHR_LENS, "--seed", "11"],
                       check=True, cwd=ROOT)
    if not os.path.exists(os.path.join(idx, "star_tpu.idx.npz")):
        from star_tpu.genome.index import GenomeIndex
        gi = GenomeIndex.generate([os.path.join(data, "genome.fa")],
                                  sa_index_nbases=14)
        gi.save(idx)
    return data, idx


def main():
    data, idx = ensure_dataset()
    baseline_rps = ref_baseline(data)
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    from star_tpu.genome.index import GenomeIndex
    import numpy as np

    gi = GenomeIndex.load(idx)

    P = Parameters(["--genomeDir", idx,
                    "--readFilesIn", os.path.join(data, "reads_se.fastq"),
                    "--outFileNamePrefix", "/tmp/star_tpu_bench_chr20/out/",
                    "--outSAMunmapped", "Within",
                    "--readMapNumber", str(N_READS)])
    os.makedirs("/tmp/star_tpu_bench_chr20/out", exist_ok=True)

    # warmup (jit compile / persistent-cache load): run exactly the two
    # batch shapes the timed section uses — one full device batch plus the
    # final partial batch (100000 = 6*16384 + 1696) — so every engine
    # shape bucket (seed loop, stitch, finalize, select) compiles here
    from star_tpu.ops.pipeline import DeviceAligner
    DeviceAligner(gi, P).warm_buckets(102)
    n_part = N_READS % P.tpuBatchSize
    Pw = P.clone(readMapNumber=P.tpuBatchSize + n_part,
                 outFileNamePrefix="/tmp/star_tpu_bench_chr20/warm/")
    os.makedirs("/tmp/star_tpu_bench_chr20/warm", exist_ok=True)
    tw0 = time.time()
    sw = align_reads(Pw, gi=gi)
    warm_dt = time.time() - tw0
    # provisional result: the remote-compile warm-up can exceed an outer
    # budget; emit a parseable (pessimistic, compile-inclusive) line now so
    # a timeout in the timed section still records a real measurement
    print(json.dumps({
        "metric": "reads aligned/sec/chip (PROVISIONAL warm pass incl. "
                  "remote jit compiles; chr20-scale 60MB genome)",
        "value": round(sw.read_n / warm_dt, 2),
        "unit": "reads/s",
        "vs_baseline": round(sw.read_n / warm_dt / baseline_rps, 4),
        "detail": {"n_reads": sw.read_n, "warm_sec": round(warm_dt, 1),
                   "baseline_ref_reads_per_sec_1thread": baseline_rps},
    }), flush=True)

    from star_tpu.ops.pipeline import TIMERS
    from star_tpu.ops.batch_engine import FB_STATS
    TIMERS.clear()
    FB_STATS.clear()
    t0 = time.time()
    stats = align_reads(P, gi=gi)
    dt = time.time() - t0
    reads_per_sec = stats.read_n / dt
    phases = {k: round(v, 2) for k, v in sorted(TIMERS.items())}
    phases["other"] = round(dt - sum(TIMERS.values()), 2)

    # kernel-only rate: batched MMP probes/s on the chr-scale index
    import jax
    from star_tpu.ops.jaxcfg import setup_jax_cache
    setup_jax_cache()
    from star_tpu.ops.sa_search import DeviceIndex, make_mmp_kernel
    di = DeviceIndex.build(gi, ql=128)
    kern = make_mmp_kernel(di)
    rng = np.random.default_rng(0)
    B = 8192
    qs = np.full((B, 128), -1, dtype=np.int8)
    qlens = np.full(B, 100, dtype=np.int32)
    pos = rng.integers(0, gi.n_genome - 200, size=B)
    for b in range(B):
        q = gi.t2[pos[b]:pos[b] + 100]
        qs[b, :100] = np.where(q < 4, q, 0)
    jax.block_until_ready(kern(qs, qlens))  # compile
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        out = kern(qs, qlens)
    jax.block_until_ready(out)
    probes_per_sec = B * reps / (time.time() - t0)

    # HBM-bandwidth fraction of the random-fetch primitive (the memory
    # engine under every SA bisection step): achieved random-row DMA
    # bandwidth vs the chip's peak HBM bandwidth (v5e ~819 GB/s)
    from star_tpu.ops.fetch import fetch_rows, FET
    fr = jax.jit(lambda t, o: fetch_rows(t, o, use_pallas=True))
    offs = np.asarray(rng.integers(0, gi.n_sa * 4 - 4096, B).astype(np.int32))
    jax.block_until_ready(fr(di.saf, offs))
    t0 = time.time()
    for _ in range(reps):
        o2 = fr(di.saf, offs)
    jax.block_until_ready(o2)
    fetch_bw = B * reps * FET / (time.time() - t0)
    hbm_bw_fraction = fetch_bw / 819e9

    result = {
        "metric": "reads aligned/sec/chip (synthetic 100bp SE, chr20-scale "
                  "60MB genome, 100k reads)",
        "value": round(reads_per_sec, 2),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / baseline_rps, 4),
        "detail": {
            "seed_search_probes_per_sec": round(probes_per_sec, 0),
            "random_fetch_GBps": round(fetch_bw / 1e9, 1),
            "hbm_bw_fraction": round(hbm_bw_fraction, 4),
            "baseline_ref_reads_per_sec_1thread": baseline_rps,
            "n_reads": stats.read_n,
            "phases_sec": phases,
            "oracle_fallback_reads": int(FB_STATS.get("env_final", 0)),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
