#!/usr/bin/env python3
"""Offline iteration harness for the batched post-seeding engine.

Replays stitch_batch on inputs captured with STAR_TPU_DUMP_STITCH=<dir>
(ops/pipeline.py), so engine optimization runs without the TPU seed loop or
its compile warm-up.  Reports per-phase timing and can diff results against
a saved reference pickle for regression checks.

Usage:
  STAR_TPU_DUMP_STITCH=/tmp/stitch_dump python tools/profile_bench.py 20000
  python tools/stitch_replay.py /tmp/stitch_dump [--save-ref ref.pkl]
  python tools/stitch_replay.py /tmp/stitch_dump [--check-ref ref.pkl]
  python tools/stitch_replay.py /tmp/stitch_dump --cprofile
"""
import os
import pickle
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("STAR_TPU_TIMING", "1")
# default to CPU (the environment's sitecustomize pins the TPU platform
# programmatically, so set the jax config too); pass --tpu to use the chip
if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")


def summarize(results, fallback, P):
    """stable digest of the engine output for cross-version comparison;
    normalizes 'mapped to too many loci' reads to what _fast_finish
    actually consumes (the device path ships only their trBest lane)"""
    out = {}
    nmax = P.outFilterMultimapNmax
    rng = P.outFilterMultimapScoreRange
    for b, pre in sorted(results.items()):
        win_list, msm = pre[0], pre[1]
        over = len(pre) > 2 and pre[2]
        tb = None
        for win in win_list:
            w0 = win[0]
            if tb is None or w0.maxScore > tb.maxScore \
                    or (w0.maxScore == tb.maxScore
                        and w0.gLength < tb.gLength):
                tb = w0
        if tb is None or tb.maxScore == 0:
            out[b] = ("EMPTY", tuple(msm))
            continue
        if not over:
            prox = [t for win in win_list for t in win
                    if t.maxScore + rng >= tb.maxScore]
            n_tr = len(prox)
        if over or n_tr > nmax:
            out[b] = ("OVER", tb.maxScore, tb.gLength, tb.nMM, tb.nMatch,
                      tb.mappedLength, tuple(map(tuple, tb.exons)))
        else:
            rows = tuple((t.maxScore, t.gLength, t.nExons,
                          tuple(map(tuple, t.exons))) for t in prox)
            out[b] = ("OK", rows, tuple(msm))
    return out, fallback.copy()


def main():
    dump = sys.argv[1]
    save_ref = check_ref = None
    if "--save-ref" in sys.argv:
        save_ref = sys.argv[sys.argv.index("--save-ref") + 1]
    if "--check-ref" in sys.argv:
        check_ref = sys.argv[sys.argv.index("--check-ref") + 1]
    do_prof = "--cprofile" in sys.argv

    import bench
    from star_tpu.genome.index import GenomeIndex
    from star_tpu.params import Parameters
    from star_tpu.ops import batch_engine as be
    from star_tpu.ops.pipeline import TIMERS, timing_report

    data, idx = bench.ensure_dataset()
    gi = GenomeIndex.load(idx)
    P = Parameters(["--genomeDir", idx,
                    "--readFilesIn", os.path.join(data, "reads_se.fastq"),
                    "--outFileNamePrefix", "/tmp/star_tpu_bench_chr20/out/"])

    batches = sorted(f for f in os.listdir(dump) if f.endswith(".pkl"))
    if "--twice" in sys.argv:
        # first pass pays the compiles; report the second (warm) pass
        for fn in batches:
            with open(os.path.join(dump, fn), "rb") as f:
                d = pickle.load(f)
            be.stitch_batch(gi, P, d["seeds"], d["fwd"], d["rc"],
                            d["lread"], d["read_len2"], d["nmm_max"],
                            lazy=True)
        TIMERS.clear()
        print("[warm pass done]")
    print(f"{len(batches)} captured batches")
    all_sums = []
    n_reads = 0
    if do_prof:
        import cProfile
        pr = cProfile.Profile()
    t0 = time.time()
    for fn in batches:
        with open(os.path.join(dump, fn), "rb") as f:
            d = pickle.load(f)
        n_reads += len(d["lread"])
        if do_prof:
            pr.enable()
        fb, results = be.stitch_batch(gi, P, d["seeds"], d["fwd"], d["rc"],
                                      d["lread"], d["read_len2"],
                                      d["nmm_max"], lazy=True)
        if do_prof:
            pr.disable()
        all_sums.append(summarize(results, fb, P))
    dt = time.time() - t0
    print(f"{n_reads} reads in {dt:.2f}s = {n_reads/dt:.0f} reads/s "
          f"(stitch only)")
    print("phases:", timing_report())
    print("fallback causes:", dict(be.FB_STATS))

    if save_ref:
        with open(save_ref, "wb") as f:
            pickle.dump(all_sums, f)
        print(f"saved reference digest to {save_ref}")
    if check_ref:
        with open(check_ref, "rb") as f:
            ref = pickle.load(f)
        assert len(ref) == len(all_sums), "batch count mismatch"
        nerr = 0
        for bi, ((r_res, r_fb), (n_res, n_fb)) in enumerate(
                zip(ref, all_sums)):
            if (r_fb != n_fb).any():
                print(f"batch {bi}: fallback mismatch at "
                      f"{(r_fb != n_fb).nonzero()[0][:10]}")
                nerr += 1
            for b in r_res:
                if r_res[b] != n_res.get(b):
                    print(f"batch {bi} read {b}: result mismatch")
                    nerr += 1
                    if nerr > 10:
                        sys.exit("too many mismatches")
        print("OK: results identical to reference digest" if nerr == 0
              else f"{nerr} mismatches")
        sys.exit(1 if nerr else 0)
    if do_prof:
        import pstats
        st = pstats.Stats(pr)
        st.sort_stats("tottime").print_stats(25)


if __name__ == "__main__":
    main()
