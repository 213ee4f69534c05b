"""Golden integration tests: byte-identical SAM / SJ.out.tab vs reference STAR
2.7.11b outputs on the bundled test configs."""
import os

import pytest

from tests.conftest import DATA, GOLD


def _strip_header(path):
    with open(path) as f:
        return [l for l in f if not l.startswith("@")]


def _run_align(tmp_path, genome_dir, reads, extra=(), use_device=False):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", genome_dir,
                    "--readFilesIn", *reads,
                    "--outFileNamePrefix", prefix,
                    "--outSAMunmapped", "Within", *extra])
    align_reads(P, use_device=use_device)
    return prefix


@pytest.mark.parametrize("case,reads", [
    ("se", ["reads_se.fastq"]),
    ("pe", ["reads_pe_1.fastq", "reads_pe_2.fastq"]),
])
def test_golden_sam_identical(tmp_path, case, reads, use_device):
    prefix = _run_align(tmp_path, os.path.join(GOLD, "genome_idx"),
                        [os.path.join(DATA, r) for r in reads],
                        use_device=use_device)
    got = _strip_header(prefix + "Aligned.out.sam")
    want = _strip_header(os.path.join(GOLD, case, "Aligned.out.sam"))
    assert got == want


@pytest.mark.parametrize("case", ["se", "pe"])
def test_golden_sj_identical(tmp_path, case, use_device):
    reads = {"se": ["reads_se.fastq"],
             "pe": ["reads_pe_1.fastq", "reads_pe_2.fastq"]}[case]
    prefix = _run_align(tmp_path, os.path.join(GOLD, "genome_idx"),
                        [os.path.join(DATA, r) for r in reads],
                        use_device=use_device)
    with open(prefix + "SJ.out.tab") as f1, \
         open(os.path.join(GOLD, case, "SJ.out.tab")) as f2:
        assert f1.read() == f2.read()


def test_log_final_stats_match(tmp_path):
    prefix = _run_align(tmp_path, os.path.join(GOLD, "genome_idx"),
                        [os.path.join(DATA, "reads_se.fastq")])
    def body(path):
        with open(path) as f:
            return [l for l in f][4:]  # skip timestamps/speed
    assert body(prefix + "Log.final.out") == body(os.path.join(GOLD, "se", "Log.final.out"))


def test_pe_overlap_merge_map(tmp_path, use_device):
    """--peOverlapNbasesMin: merge overlapping mates, remap as SE, convert
    windows back to PE (reference ReadAlign_peOverlapMergeMap.cpp)"""
    prefix = _run_align(tmp_path, os.path.join(GOLD, "genome_idx"),
                        [os.path.join(DATA, "reads_peov_1.fastq"),
                         os.path.join(DATA, "reads_peov_2.fastq")],
                        extra=["--peOverlapNbasesMin", "10"],
                        use_device=use_device)
    got = _strip_header(prefix + "Aligned.out.sam")
    want = _strip_header(os.path.join(GOLD, "peov", "Aligned.out.sam"))
    assert got == want
    with open(prefix + "SJ.out.tab") as a, \
         open(os.path.join(GOLD, "peov", "SJ.out.tab")) as b:
        assert a.read() == b.read()


def test_starlong_golden(tmp_path):
    """--tpuLongReads: STARlong long-read mode (reference STARlong binary,
    COMPILE_FOR_LONG_READS IncludeDefine.h:126-140; seed-chain DP
    ReadAlign_stitchWindowSeeds.cpp:12-50; coverage window filtering
    ReadAlign_stitchPieces.cpp:202-257).  SAM + SJ byte-identical on
    0.5-3 kb spliced reads with mismatches and indels."""
    prefix = _run_align(tmp_path, os.path.join(GOLD, "genome_idx"),
                        [os.path.join(DATA, "reads_long.fastq")],
                        extra=["--tpuLongReads", "1"])
    got = _strip_header(prefix + "Aligned.out.sam")
    want = _strip_header(os.path.join(GOLD, "long", "Aligned.out.sam"))
    assert got == want
    with open(prefix + "SJ.out.tab") as a, \
         open(os.path.join(GOLD, "long", "SJ.out.tab")) as b:
        assert a.read() == b.read()
