"""STARsolo CB_UMI_Simple Gene counting vs reference golden matrices."""
import os

from tests.conftest import DATA, GOLD


def test_solo_gene_matrices(tmp_path, genome_index_gtf):
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
    align_reads(P, gi=genome_index_gtf, use_device=False)
    for f in ["raw/barcodes.tsv", "raw/features.tsv", "raw/matrix.mtx",
              "filtered/barcodes.tsv", "filtered/matrix.mtx",
              "UMIperCellSorted.txt"]:
        with open(prefix + "Solo.out/Gene/" + f) as a, \
             open(os.path.join(GOLD, "solo", "Solo.out", "Gene", f)) as b:
            assert a.read() == b.read(), f


def test_solo_stats_files(tmp_path, genome_index_gtf):
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
    align_reads(P, gi=genome_index_gtf, use_device=False)
    for f in ["Gene/Summary.csv", "Barcodes.stats", "Gene/Features.stats"]:
        with open(prefix + "Solo.out/" + f) as a, \
             open(os.path.join(GOLD, "solo", "Solo.out", f)) as b:
            assert a.read() == b.read(), f
