"""Batch engine vs host oracle: windows/assignment must match exactly."""
import os

import numpy as np
import pytest

from star_tpu.params import Parameters
from star_tpu.genome.index import GenomeIndex
from star_tpu.align.engine import ReadAligner
from star_tpu.align.seed import search_pieces
from star_tpu.io.fastq import read_pairs
from star_tpu.ops import batch_engine as be

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "tests", "data", "small")
GOLD = os.path.join(ROOT, "tests", "golden", "small")


def _seed_arrays(per_read_pc):
    read, rs, ln, idir, nrep, lo, hi, ifrag = [], [], [], [], [], [], [], []
    for i, pc in enumerate(per_read_pc):
        for row in pc:
            read.append(i)
            rs.append(row[0]); ln.append(row[1]); idir.append(row[2])
            nrep.append(row[3]); lo.append(row[4]); hi.append(row[5])
            ifrag.append(row[6])
    return be.SeedArrays(
        read=np.asarray(read, np.int32), r_start=np.asarray(rs, np.int64),
        length=np.asarray(ln, np.int64), idir=np.asarray(idir, np.int8),
        nrep=np.asarray(nrep, np.int64), lo=np.asarray(lo, np.int64),
        hi=np.asarray(hi, np.int64), ifrag=np.asarray(ifrag, np.int8))


def _run_case(idx_dir, reads_files, extra=()):
    gi = GenomeIndex.load_reference_dir(idx_dir)
    P = Parameters(["--genomeDir", idx_dir, "--readFilesIn", *reads_files,
                    *extra])
    ra = ReadAligner(gi, P)
    items = list(read_pairs(reads_files))
    per_pc, lreads, host_ws = [], [], []
    for name, seqs, quals, ft in items:
        res, reads = ra.prepare_read(name, seqs, quals)
        seeds = search_pieces(gi, P, reads[0], res.lread)
        per_pc.append(seeds.pc)
        lreads.append(res.lread)
        ws = ra.wb.build(seeds, res.lread)
        host_ws.append(ws)
    n = len(items)
    sa = _seed_arrays(per_pc)
    lread = np.asarray(lreads, np.int64)
    recs = be.expand_hits(gi, P, sa, lread, n)
    crec, cc = be.densify(recs, n, mask=recs["anchor"])
    ws = be.build_windows(gi, P, crec, cc, n)
    own = be.compute_owner(P, gi, ws, recs["read"], recs["a1"],
                           recs["strand"])
    keep = (own >= 0) & ~ws.fallback[recs["read"]]
    recs_k = {k: v[keep] for k, v in recs.items()}
    recs_k["own"] = own[keep]
    st = be.assign_pairs(gi, P, ws, recs_k, be.S_MAX)
    return host_ws, ws, st, n


CASES = [
    (os.path.join(GOLD, "genome_idx"), [os.path.join(DATA, "reads_se.fastq")], ()),
    (os.path.join(GOLD, "genome_idx_gtf"), [os.path.join(DATA, "reads_se.fastq")], ()),
    (os.path.join(GOLD, "genome_idx_gtf"),
     [os.path.join(DATA, "reads_pe_1.fastq"), os.path.join(DATA, "reads_pe_2.fastq")], ()),
    (os.path.join(GOLD, "genome_idx"),
     [os.path.join(DATA, "reads_peov_1.fastq"), os.path.join(DATA, "reads_peov_2.fastq")], ()),
]


@pytest.mark.parametrize("idx_dir,reads,extra", CASES)
def test_windows_and_assignment_match_host(idx_dir, reads, extra):
    host_ws, ws, st, n = _run_case(idx_dir, reads, extra)
    n_fb = 0
    for i in range(n):
        hw = host_ws[i]
        if st.fallback[i]:
            n_fb += 1
            continue
        assert hw.map_marker == 0
        # windows: compare live windows in slot order vs host wc order
        nwin = int(ws.win_n[i])
        assert nwin == len(hw.wc), (i, nwin, hw.wc)
        for w in range(nwin):
            hwc = hw.wc[w]
            if not ws.win_alive[i, w]:
                assert hwc[2] > hwc[3], (i, w, hwc)
                continue
            assert hwc[0] == ws.win_str[i, w]
            assert hwc[1] == ws.win_chr[i, w]
            # host wc[2],wc[3] are post-flank extents
            assert hwc[2] == ws.win_flo[i, w], (i, w, hwc, ws.win_flo[i, w])
            assert hwc[3] == ws.win_fhi[i, w]
            # seed table (pair-keyed WA rows)
            hwa = hw.wa[w]
            pr = np.nonzero((st.pb == i) & (st.pw == w))[0]
            n_got = int(st.wa_n[pr[0]]) if len(pr) else 0
            assert n_got == len(hwa), (i, w, hwa, n_got)
            for s, row in enumerate(hwa):
                r = pr[0]
                got = [int(st.wa_len[r, s]), int(st.wa_rs[r, s]),
                       int(st.wa_gs[r, s]), int(st.wa_nrep[r, s]),
                       int(st.wa_anchor[r, s]), int(st.wa_frag[r, s]),
                       int(st.wa_sja[r, s])]
                assert got == [int(x) for x in row], (i, w, s, got, row)
    # the fast path must cover the bulk of reads
    assert n_fb <= n * 0.5


def test_nsplit_reads_device_matches_host(tmp_path):
    """reads with N-split pieces (p_start>0): the reference's flagDirMap skip
    compares Shift+L (absolute position) against the piece length
    (ReadAlign_mapOneRead.cpp:74); the device replay must reproduce that"""
    from star_tpu.run import align_reads
    gi = GenomeIndex.load_reference_dir(os.path.join(GOLD, "genome_idx"))
    import numpy as np
    from star_tpu.constants import NUM_TO_NT
    rng = np.random.default_rng(5)
    fq = tmp_path / "n.fastq"
    with open(fq, "w") as f:
        for i in range(24):
            p = int(rng.integers(0, gi.n_genome - 200))
            seq = "".join(NUM_TO_NT[b] if b < 4 else "A"
                          for b in gi.G[p:p + 90])
            nn = int(rng.integers(1, 8))
            read = "N" * nn + seq  # piece starts at p_start = nn
            f.write(f"@r{i}\n{read}\n+\n{'I' * len(read)}\n")
    outs = []
    for dev in (False, True):
        pre = str(tmp_path / f"o{int(dev)}") + "/"
        os.makedirs(pre, exist_ok=True)
        P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                        "--readFilesIn", str(fq),
                        "--outFileNamePrefix", pre,
                        "--outSAMunmapped", "Within"])
        align_reads(P, use_device=dev)
        outs.append(open(pre + "Aligned.out.sam").read())
    assert outs[0] == outs[1]
