"""sjdb/GTF: index build with annotations must match the reference index
bit-for-bit, and sjdb-aware alignment must reproduce the golden SAM."""
import os

import numpy as np
import pytest

from tests.conftest import DATA, GOLD


def test_gtf_index_matches_reference(tmp_path, genome_index_gtf):
    from star_tpu.params import Parameters
    from star_tpu.genome.index import GenomeIndex
    from star_tpu.genome.sjdb import insert_junctions_from_annotations
    P = Parameters(["--genomeFastaFiles", os.path.join(DATA, "genome.fa"),
                    "--sjdbGTFfile", os.path.join(DATA, "annot.gtf"),
                    "--sjdbOverhang", "99",
                    "--genomeDir", str(tmp_path)])
    gi = GenomeIndex.generate(P.genomeFastaFiles, sa_index_nbases=8)
    gi2 = insert_junctions_from_annotations(gi, P)
    ref = genome_index_gtf
    assert np.array_equal(gi2.G, ref.G)
    assert np.array_equal(gi2.sa, ref.sa)
    assert np.array_equal(gi2.sai_val, ref.sai_val)
    assert np.array_equal(gi2.sjdb_start, ref.sjdb_start)
    assert np.array_equal(gi2.sjdb_motif, ref.sjdb_motif)
    for fn in ["sjdbInfo.txt", "sjdbList.out.tab", "geneInfo.tab",
               "transcriptInfo.tab", "exonInfo.tab", "exonGeTrInfo.tab"]:
        with open(os.path.join(str(tmp_path), fn)) as a, \
             open(os.path.join(GOLD, "genome_idx_gtf", fn)) as b:
            assert a.read() == b.read(), fn


def test_sjdb_alignment_golden(tmp_path, genome_index_gtf, use_device):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx_gtf"),
                    "--readFilesIn", os.path.join(DATA, "reads_se.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--outSAMunmapped", "Within"])
    align_reads(P, gi=genome_index_gtf, use_device=use_device)
    got = [l for l in open(prefix + "Aligned.out.sam") if not l.startswith("@")]
    want = [l for l in open(os.path.join(GOLD, "se_gtf", "Aligned.out.sam"))
            if not l.startswith("@")]
    assert got == want
    with open(prefix + "SJ.out.tab") as a, \
         open(os.path.join(GOLD, "se_gtf", "SJ.out.tab")) as b:
        assert a.read() == b.read()


def test_gene_counts_golden(tmp_path, genome_index_gtf, use_device):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx_gtf"),
                    "--readFilesIn", os.path.join(DATA, "reads_se.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--outSAMunmapped", "Within", "--quantMode", "GeneCounts"])
    align_reads(P, gi=genome_index_gtf, use_device=use_device)
    with open(prefix + "ReadsPerGene.out.tab") as a, \
         open(os.path.join(GOLD, "se_quant", "ReadsPerGene.out.tab")) as b:
        assert a.read() == b.read()
