"""STARconsensus genome transform vs reference goldens: VCF-transformed
index generation (haploid + diploid), conversion blocks, transformed
annotations, and --genomeTransformOutput SAM back-conversion including the
diploid duplicate-removal slot semantics and ha tags.
Reference: Genome_transformGenome.cpp, Transcript_transformGenome.cpp,
ReadAlign_transformGenome.cpp."""
import os

import pytest

from tests.conftest import DATA, GOLD

META_FILES = ("transformGenomeBlocks.tsv", "chrStart.txt", "chrLength.txt",
              "chrName.txt", "exonInfo.tab", "transcriptInfo.tab",
              "geneInfo.tab", "sjdbList.out.tab")


def _generate(tmpdir, ttype):
    from star_tpu.params import Parameters
    from star_tpu.run import genome_generate
    P = Parameters(["--runMode", "genomeGenerate", "--genomeDir", tmpdir,
                    "--genomeFastaFiles", os.path.join(DATA, "genome.fa"),
                    "--genomeSAindexNbases", "8",
                    "--genomeTransformType", ttype,
                    "--genomeTransformVCF", os.path.join(DATA, "transform.vcf"),
                    "--sjdbGTFfile", os.path.join(DATA, "annot.gtf"),
                    "--sjdbOverhang", "99"])
    genome_generate(P)
    return tmpdir


@pytest.fixture(scope="session")
def transform_idx(tmp_path_factory):
    return {
        "Haploid": _generate(str(tmp_path_factory.mktemp("tf_hap")), "Haploid"),
        "Diploid": _generate(str(tmp_path_factory.mktemp("tf_dip")), "Diploid"),
    }


@pytest.mark.parametrize("ttype,gold_idx", [("Haploid", "idx_transform_hap"),
                                            ("Diploid", "idx_transform_dip")])
def test_transform_index_metadata(transform_idx, ttype, gold_idx):
    idx = transform_idx[ttype]
    for f in META_FILES:
        with open(os.path.join(idx, f)) as a, \
             open(os.path.join(GOLD, gold_idx, f)) as b:
            assert a.read() == b.read(), f


@pytest.mark.parametrize("ttype,gold,extra", [
    ("Haploid", "tf_hap", []),
    ("Diploid", "tf_dip", ["--outSAMattributes", "NH", "HI", "AS", "nM", "ha"]),
])
def test_transform_output_sam(transform_idx, tmp_path, ttype, gold, extra,
                              use_device):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", transform_idx[ttype],
                    "--readFilesIn", os.path.join(DATA, "reads_se.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--outSAMunmapped", "Within",
                    "--genomeTransformOutput", "SAM"] + extra)
    align_reads(P, use_device=use_device)
    got = [l for l in open(prefix + "Aligned.out.sam") if not l.startswith("@")]
    want = [l for l in open(os.path.join(GOLD, gold, "Aligned.out.sam"))
            if not l.startswith("@")]
    assert got == want
    with open(prefix + "SJ.out.tab") as a, \
         open(os.path.join(GOLD, gold, "SJ.out.tab")) as b:
        assert a.read() == b.read()
    # @SQ header reports the ORIGINAL chromosomes
    sq = [l for l in open(prefix + "Aligned.out.sam") if l.startswith("@SQ")]
    sqw = [l for l in open(os.path.join(GOLD, gold, "Aligned.out.sam"))
           if l.startswith("@SQ")]
    assert sq == sqw
