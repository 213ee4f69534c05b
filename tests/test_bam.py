"""BAM output: decompressed record streams must match the reference BAMs
byte-for-byte (both unsorted and coordinate-sorted)."""
import gzip
import os
import struct

import pytest

from tests.conftest import DATA, GOLD


def read_bam_records(path):
    data = gzip.decompress(open(path, "rb").read())
    assert data[:4] == b"BAM\x01"
    lt = struct.unpack("<i", data[4:8])[0]
    off = 8 + lt
    nref = struct.unpack("<i", data[off:off + 4])[0]
    off += 4
    refs = []
    for _ in range(nref):
        ln = struct.unpack("<i", data[off:off + 4])[0]
        refs.append(data[off + 4:off + 4 + ln - 1].decode())
        off += 4 + ln + 4
    recs = []
    while off < len(data):
        sz = struct.unpack("<I", data[off:off + 4])[0]
        recs.append(data[off + 4:off + 4 + sz])
        off += 4 + sz
    return refs, recs


def test_bam_golden_se(tmp_path, genome_index, use_device):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn", os.path.join(DATA, "reads_se.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--outSAMunmapped", "Within",
                    "--outSAMtype", "BAM", "Unsorted", "SortedByCoordinate"])
    align_reads(P, gi=genome_index, use_device=use_device)
    for fn in ["Aligned.out.bam", "Aligned.sortedByCoord.out.bam"]:
        refs_a, mine = read_bam_records(prefix + fn)
        refs_b, want = read_bam_records(os.path.join(GOLD, "se_bam", fn))
        assert refs_a == refs_b
        assert mine == want, fn


def test_transcriptome_sam_golden(tmp_path, genome_index_gtf, use_device):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx_gtf"),
                    "--readFilesIn", os.path.join(DATA, "reads_se.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--quantMode", "TranscriptomeSAM"])
    align_reads(P, gi=genome_index_gtf, use_device=use_device)
    refs_a, mine = read_bam_records(prefix + "Aligned.toTranscriptome.out.bam")
    refs_b, want = read_bam_records(
        os.path.join(GOLD, "se_trsam", "Aligned.toTranscriptome.out.bam"))
    assert refs_a == refs_b
    assert mine == want


@pytest.mark.parametrize("dtype,pre", [("UniqueIdentical", ""),
                                       ("UniqueIdenticalNotMulti", "nm_")])
def test_bam_remove_duplicates(tmp_path, dtype, pre):
    """--runMode inputAlignmentsFromBAM --bamRemoveDuplicatesType: 0x400
    duplicate marking byte-identical (incl. group/pairing/unmark rules)"""
    from star_tpu.run import main as star_main
    prefix = str(tmp_path) + "/" + pre
    star_main(["--runMode", "inputAlignmentsFromBAM",
               "--inputBAMfile",
               os.path.join(GOLD, "dedup", "Aligned.sortedByCoord.out.bam"),
               "--bamRemoveDuplicatesType", dtype,
               "--outFileNamePrefix", prefix])
    _, got = read_bam_records(prefix + "Processed.out.bam")
    _, want = read_bam_records(os.path.join(GOLD, "dedup",
                                            pre + "Processed.out.bam"))
    assert got == want


@pytest.mark.parametrize("sub,extra", [
    ("var", ["--outSAMattributes", "NH", "HI", "AS", "nM", "vA", "vG"]),
    ("wasp", ["--outSAMattributes", "NH", "HI", "AS", "nM", "vA", "vG", "vW",
              "--waspOutputMode", "SAMtag"]),
])
def test_variation_wasp_golden(tmp_path, sub, extra, use_device):
    """--varVCFfile vA/vG SNP tags and --waspOutputMode SAMtag vW tags
    byte-identical (Variation.cpp, Transcript_variationAdjust.cpp,
    ReadAlign_waspMap.cpp); covers vW classes 1/2/7, het/hom genotypes,
    multi-allelic 1|2, FORMAT extras, (-) strand conversion."""
    from star_tpu.run import main as star_main
    prefix = str(tmp_path) + "/"
    star_main(["--genomeDir", os.path.join(GOLD, "genome_idx"),
               "--readFilesIn", os.path.join(DATA, "reads_se.fastq"),
               "--outFileNamePrefix", prefix, "--outSAMtype", "BAM", "Unsorted",
               "--varVCFfile", os.path.join(DATA, "var.vcf"),
               "--tpuUseDevice", str(int(use_device))] + extra)
    _, got = read_bam_records(prefix + "Aligned.out.bam")
    _, want = read_bam_records(os.path.join(GOLD, sub, "Aligned.out.bam"))
    assert got == want


def test_bam_sort_spill(tmp_path, genome_index, monkeypatch):
    """genome-bin spill sort must produce the same record stream as the
    in-memory sort (bounded-memory path; reference BAMoutput.cpp bins)"""
    from star_tpu.io.bam import BamCollector
    monkeypatch.setattr(BamCollector, "SPILL_BYTES_PER_BIN", 256)
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn", os.path.join(DATA, "reads_se.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--outSAMunmapped", "Within",
                    "--outSAMtype", "BAM", "SortedByCoordinate"])
    align_reads(P, gi=genome_index, use_device=False)
    _, mine = read_bam_records(prefix + "Aligned.sortedByCoord.out.bam")
    _, want = read_bam_records(
        os.path.join(GOLD, "se_bam", "Aligned.sortedByCoord.out.bam"))
    assert mine == want
    # progress + main logs exist (bounded-memory streaming side outputs)
    assert os.path.exists(prefix + "Log.progress.out")
    assert os.path.exists(prefix + "Log.out")
