"""Chimeric detection: Chimeric.out.junction must match the reference."""
import os

import pytest

from tests.conftest import DATA, GOLD


def test_chimeric_golden(tmp_path, genome_index, use_device):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn", os.path.join(DATA, "reads_chim.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--outSAMunmapped", "Within", "--chimSegmentMin", "12"])
    align_reads(P, gi=genome_index, use_device=use_device)
    with open(prefix + "Chimeric.out.junction") as a, \
         open(os.path.join(GOLD, "se_chim", "Chimeric.out.junction")) as b:
        assert a.read() == b.read()
    got = [l for l in open(prefix + "Aligned.out.sam") if not l.startswith("@")]
    want = [l for l in open(os.path.join(GOLD, "se_chim", "Aligned.out.sam"))
            if not l.startswith("@")]
    assert got == want


def test_chimeric_mult_junctions(tmp_path, genome_index, use_device):
    """--chimMultimapNmax > 0: all window-pair chimeras within score range,
    extended junction columns + header (ChimericDetection_chimericDetectionMult
    .cpp, ChimericAlign_chimericStitching.cpp)"""
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn", os.path.join(DATA, "reads_chim.fastq"),
                    "--outFileNamePrefix", prefix, "--outSAMunmapped", "Within",
                    "--chimSegmentMin", "20", "--chimMultimapNmax", "20",
                    "--chimOutType", "Junctions"])
    align_reads(P, gi=genome_index, use_device=use_device)
    with open(prefix + "Chimeric.out.junction") as a, \
         open(os.path.join(GOLD, "chim_mult", "Chimeric.out.junction")) as b:
        assert a.read() == b.read()
    got = [l for l in open(prefix + "Aligned.out.sam") if not l.startswith("@")]
    want = [l for l in open(os.path.join(GOLD, "chim_mult", "Aligned.out.sam"))
            if not l.startswith("@")]
    assert got == want


@pytest.mark.parametrize("name,extra,gold", [
    ("old", ["--chimSegmentMin", "12", "--chimOutType", "WithinBAM",
             "--outSAMattributes", "NH", "HI", "AS", "nM", "ch"],
     "chim_wbam_old"),
    ("mult", ["--chimSegmentMin", "20", "--chimMultimapNmax", "20",
              "--chimOutType", "WithinBAM", "Junctions",
              "--outSAMattributes", "NH", "HI", "AS", "nM", "NM", "ch"],
     "chim_wbam_mult"),
])
def test_chimeric_within_bam(tmp_path, genome_index, name, extra, gold,
                             use_device):
    """--chimOutType WithinBAM: supplementary records with SA tags, hard
    clips, suppressed linear output (ChimericAlign_chimericBAMoutput.cpp,
    oneRead.cpp:99)"""
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    from tests.test_bam import read_bam_records
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn", os.path.join(DATA, "reads_chim.fastq"),
                    "--outFileNamePrefix", prefix, "--outSAMunmapped", "Within",
                    "--outSAMtype", "BAM", "Unsorted"] + extra)
    align_reads(P, gi=genome_index, use_device=use_device)
    _, got = read_bam_records(prefix + "Aligned.out.bam")
    _, want = read_bam_records(
        os.path.join(GOLD, gold, "Aligned.out.bam"))
    assert got == want


def test_chimeric_separate_sam_old(tmp_path):
    """--chimOutType SeparateSAMold writes Chimeric.out.sam (reference
    ReadAlign_chimericDetectionOldOutput.cpp)"""
    import os
    from tests.conftest import DATA, GOLD
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn", os.path.join(DATA, "reads_chim.fastq"),
                    "--chimSegmentMin", "20",
                    "--chimOutType", "SeparateSAMold",
                    "--outSAMunmapped", "Within",
                    "--outFileNamePrefix", prefix])
    align_reads(P, use_device=False)
    strip = lambda p: [l for l in open(p)
                       if not l.startswith(("@PG", "@CO"))]
    assert strip(prefix + "Chimeric.out.sam") == strip(os.path.join(
        GOLD, "chim_samold", "Chimeric.out.sam"))
