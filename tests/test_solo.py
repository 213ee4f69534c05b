"""STARsolo CB_UMI_Simple Gene counting vs reference golden matrices."""
import os

from tests.conftest import DATA, GOLD


def test_solo_gene_matrices(tmp_path, genome_index_gtf, use_device):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx_gtf"),
                    "--readFilesIn", os.path.join(DATA, "solo_cdna.fastq"),
                    os.path.join(DATA, "solo_bc.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--soloType", "CB_UMI_Simple",
                    "--soloCBwhitelist", os.path.join(DATA, "solo_wl.txt"),
                    "--soloCBstart", "1", "--soloCBlen", "16",
                    "--soloUMIstart", "17", "--soloUMIlen", "12",
                    "--outSAMtype", "None"])
    align_reads(P, gi=genome_index_gtf, use_device=use_device)
    for f in ["raw/barcodes.tsv", "raw/features.tsv", "raw/matrix.mtx",
              "filtered/barcodes.tsv", "filtered/matrix.mtx",
              "UMIperCellSorted.txt"]:
        with open(prefix + "Solo.out/Gene/" + f) as a, \
             open(os.path.join(GOLD, "solo", "Solo.out", "Gene", f)) as b:
            assert a.read() == b.read(), f


def test_solo_stats_files(tmp_path, genome_index_gtf, use_device):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx_gtf"),
                    "--readFilesIn", os.path.join(DATA, "solo_cdna.fastq"),
                    os.path.join(DATA, "solo_bc.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--soloType", "CB_UMI_Simple",
                    "--soloCBwhitelist", os.path.join(DATA, "solo_wl.txt"),
                    "--soloCBstart", "1", "--soloCBlen", "16",
                    "--soloUMIstart", "17", "--soloUMIlen", "12",
                    "--outSAMtype", "None"])
    align_reads(P, gi=genome_index_gtf, use_device=use_device)
    for f in ["Gene/Summary.csv", "Barcodes.stats", "Gene/Features.stats"]:
        with open(prefix + "Solo.out/" + f) as a, \
             open(os.path.join(GOLD, "solo", "Solo.out", f)) as b:
            assert a.read() == b.read(), f


def test_solo_emptydrops_cr(tmp_path):
    """EmptyDrops_CR cell calling: filtered matrix must match the reference
    (SGT ambient profile + mt19937 Monte-Carlo p-values replicated exactly)."""
    from star_tpu.params import Parameters
    from star_tpu.genome.index import GenomeIndex
    from star_tpu.genome.sjdb import insert_junctions_from_annotations
    from star_tpu.run import align_reads
    idx_dir = str(tmp_path / "idx")
    Pg = Parameters(["--genomeFastaFiles", os.path.join(DATA, "genome.fa"),
                     "--sjdbGTFfile", os.path.join(DATA, "annot2.gtf"),
                     "--sjdbOverhang", "79", "--genomeDir", idx_dir])
    gi = GenomeIndex.generate(Pg.genomeFastaFiles, sa_index_nbases=8)
    gi = insert_junctions_from_annotations(gi, Pg)
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", idx_dir,
                    "--readFilesIn", os.path.join(DATA, "solo2_cdna.fastq"),
                    os.path.join(DATA, "solo2_bc.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--soloType", "CB_UMI_Simple",
                    "--soloCBwhitelist", os.path.join(DATA, "solo2_wl.txt"),
                    "--soloCBstart", "1", "--soloCBlen", "16",
                    "--soloUMIstart", "17", "--soloUMIlen", "12",
                    "--outSAMtype", "None",
                    "--soloCellFilter", "EmptyDrops_CR", "60", "0.99", "10",
                    "100", "400", "10", "0.01", "200", "0.01", "300"])
    P.trInfoDir = idx_dir
    align_reads(P, gi=gi, use_device=False)
    for f in ["raw/matrix.mtx", "filtered/barcodes.tsv", "filtered/matrix.mtx"]:
        with open(prefix + "Solo.out/Gene/" + f) as a, \
             open(os.path.join(GOLD, "solo_ed", "Solo.out", "Gene", f)) as b:
            assert a.read() == b.read(), f
