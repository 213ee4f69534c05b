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


def test_incremental_insertion_matches_rebuild(genome_index, tmp_path):
    """the incremental rank-merge SA insertion must equal the full re-sort"""
    import numpy as np
    from star_tpu.genome import sjdb as sjdb_mod
    from star_tpu.genome.gtf import SjdbLoci
    from star_tpu.params import Parameters
    gi = genome_index
    loci = SjdbLoci()
    rng = np.random.default_rng(3)
    for i in range(20):
        s = int(rng.integers(1000, 30000))
        loci.chr.append("chr1")
        loci.start.append(s)
        loci.end.append(s + int(rng.integers(80, 900)))
        loci.str_.append(".")
        loci.gene.append(set())
        loci.priority.append(0)
    gi.sjdb_overhang = 100
    P = Parameters(["--genomeDir", "x", "--readFilesIn", "y"])
    gi2 = sjdb_mod.insert_junctions(gi, loci, P)
    # force the rebuild path and compare
    import star_tpu.genome.native as native
    orig = native.sa_insert_positions
    native.sa_insert_positions = lambda *a, **k: None
    try:
        gi3 = sjdb_mod.insert_junctions(gi, loci, P)
    finally:
        native.sa_insert_positions = orig
    assert np.array_equal(np.asarray(gi2.sa), np.asarray(gi3.sa))
    assert np.array_equal(gi2.sai_val, gi3.sai_val)


def test_sjdb_insert_save_all(tmp_path):
    """--sjdbInsertSave All persists the augmented index under _STARgenome/
    (reference sjdbInsertJunctions.cpp:70-98)"""
    import os
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    GOLD = os.path.join(ROOT, "tests", "golden", "small")
    DATA = os.path.join(ROOT, "tests", "data", "small")
    sj = tmp_path / "sj.tab"
    sj.write_text("chr1\t30001\t30500\t+\n")
    pre = str(tmp_path / "o") + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn", os.path.join(DATA, "reads_se.fastq"),
                    "--sjdbFileChrStartEnd", str(sj),
                    "--sjdbInsertSave", "All",
                    "--readMapNumber", "8",
                    "--outFileNamePrefix", pre])
    align_reads(P, use_device=False)
    saved = pre + "_STARgenome"
    assert os.path.exists(os.path.join(saved, "star_tpu.idx.npz"))
    from star_tpu.genome.index import GenomeIndex
    gi2 = GenomeIndex.load(saved)
    assert gi2.sjdb_n >= 1
