"""Run drivers: genomeGenerate and alignReads (host path).

The host path runs the exact-semantics engine read-by-read; the device path
(ops/, parallel/) accelerates the hot stages in batches and falls back here
for the long tail.  Output file surface mirrors the reference aligner.
"""
from __future__ import annotations

import os
import sys
import time
from typing import List, Optional

from .params import Parameters
from .genome.index import GenomeIndex
from .align.engine import ReadAligner
from .io.fastq import read_pairs
from .io.sam import sam_header, write_read_sam
from .io.sj import SJCollector
from .stats import RunStats


def genome_generate(P: Parameters):
    gi = GenomeIndex.generate(
        P.genomeFastaFiles, chr_bin_nbits=P.genomeChrBinNbits,
        sa_index_nbases=P.genomeSAindexNbases, sa_sparse_d=P.genomeSAsparseD)
    if P.sjdbGTFfile != "-" or P.sjdbFileChrStartEnd[0] != "-":
        from .genome.sjdb import insert_junctions_from_annotations
        gi = insert_junctions_from_annotations(gi, P)
    gi.save(P.genomeDir)
    return gi


def align_reads(P: Parameters, gi: Optional[GenomeIndex] = None, use_device=None):
    if gi is None:
        gi = GenomeIndex.load(P.genomeDir)
    prefix = P.outFileNamePrefix
    os.makedirs(os.path.dirname(prefix) if os.path.dirname(prefix) else ".", exist_ok=True)

    stats = RunStats()
    stats.time_start_map = time.time()
    sj = SJCollector(P, gi)
    sam_lines: List[str] = []

    if use_device is None:
        use_device = bool(P.tpuUseDevice)
    results = _align_all(P, gi, stats, use_device)

    unmapped_streams = None
    if P.outReadsUnmapped == "Fastx":
        n_m = P.readNmates
        unmapped_streams = [open(prefix + f"Unmapped.out.mate{i+1}", "w") for i in range(n_m)]

    for res in results:
        if res.unmap_type < 0:
            sj.add_read(res.transcripts, res.n_tr)
            stats.add_mapped(res)
        write_read_sam(res, gi, P, sam_lines)
        if res.unmap_type >= 0:
            stats.add_unmapped(res)
            if unmapped_streams is not None:
                for im in range(len(res.seqs)):
                    mm = ""
                    if len(res.seqs) > 1:
                        mm = " 00"  # mate-mapped flags land with PE unmapped support
                    unmapped_streams[im].write(
                        f"@{res.name} {im}::{mm}\n{res.seqs[im]}\n+\n{res.quals[im]}\n")

    if unmapped_streams:
        for s in unmapped_streams:
            s.close()

    stats.time_end_map = time.time()

    if P.outSAMbool and P.outSAMmode != "None":
        with open(prefix + "Aligned.out.sam", "w") as f:
            f.write(sam_header(gi, P))
            for line in sam_lines:
                if line:
                    f.write(line + "\n")
    sj.write(prefix + "SJ.out.tab")
    with open(prefix + "Log.final.out", "w") as f:
        f.write(stats.report_final())
    return stats


def _align_all(P: Parameters, gi: GenomeIndex, stats: RunStats, use_device: bool):
    reader = read_pairs(P.readFilesIn[:P.readNmates], P.readFilesCommand)
    if use_device:
        from .ops.pipeline import DeviceAligner
        aligner = DeviceAligner(gi, P)
        yield from aligner.align_stream(reader, stats)
    else:
        aligner = ReadAligner(gi, P)
        n = 0
        for name, seqs, quals, ftype in reader:
            if P.readMapNumber >= 0 and n >= P.readMapNumber:
                break
            res = aligner.align_read(name, seqs, quals)
            res.read_file_type = ftype
            stats.add_read(res)
            n += 1
            yield res


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    P = Parameters(argv)
    if "genomeGenerate" in P.runMode:
        genome_generate(P)
    else:
        align_reads(P)


if __name__ == "__main__":
    main()
