"""Signal (wiggle/bedGraph) and Unmapped Fastx outputs vs goldens."""
import glob
import os

from tests.conftest import DATA, GOLD


def test_signal_bedgraph_golden(tmp_path, genome_index, use_device):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn", os.path.join(DATA, "reads_se.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--outSAMtype", "BAM", "SortedByCoordinate",
                    "--outWigType", "bedGraph"])
    align_reads(P, gi=genome_index, use_device=use_device)
    for f in sorted(glob.glob(os.path.join(GOLD, "se_wig", "Signal*"))):
        with open(prefix + os.path.basename(f)) as a, open(f) as b:
            assert a.read() == b.read(), f


def test_unmapped_fastx_golden(tmp_path, genome_index, use_device):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn", os.path.join(DATA, "reads_pe_1.fastq"),
                    os.path.join(DATA, "reads_pe_2.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--outReadsUnmapped", "Fastx"])
    align_reads(P, gi=genome_index, use_device=use_device)
    for f in sorted(glob.glob(os.path.join(GOLD, "pe_unm", "Unmapped*"))):
        with open(prefix + os.path.basename(f)) as a, open(f) as b:
            assert a.read() == b.read(), f


def test_liftover_golden(tmp_path):
    """--runMode liftOver: GTF lift through chain file byte-identical
    (Chain.cpp liftOverGTF), incl. gap-snap and unlifted edge cases."""
    from star_tpu.run import main as star_main
    gold = os.path.join(GOLD, "liftover")
    star_main(["--runMode", "liftOver",
               "--genomeChainFiles", os.path.join(DATA, "lift.chain"),
               "--sjdbGTFfile", os.path.join(DATA, "lift.gtf"),
               "--outFileNamePrefix", str(tmp_path) + "/"])
    for f in ["GTFliftOver_1.gtf", "GTFliftOver_1.gtf.unlifted"]:
        assert (tmp_path / f).read_text() == \
            open(os.path.join(gold, f)).read()


def test_sam_read_input_golden(tmp_path):
    """--readFilesType SAM SE: remap reads from an existing SAM
    (reference ReadAlignChunk_processChunks.cpp:27-108)"""
    import os
    from tests.conftest import GOLD
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn",
                    os.path.join(root, "tests", "data", "small_extra",
                                 "input_se.sam"),
                    "--readFilesType", "SAM", "SE",
                    "--outSAMunmapped", "Within",
                    "--outFileNamePrefix", prefix])
    align_reads(P, use_device=False)
    got = [l for l in open(prefix + "Aligned.out.sam") if not l.startswith("@")]
    want = [l for l in open(os.path.join(root, "tests", "golden", "small",
                                         "sam_input", "Aligned.out.sam"))
            if not l.startswith("@")]
    assert got == want
    assert (open(prefix + "SJ.out.tab").read()
            == open(os.path.join(root, "tests", "golden", "small",
                                 "sam_input", "SJ.out.tab")).read())


def test_multiline_fasta_golden(tmp_path):
    """multi-line FASTA reads are concatenated to one record
    (reference ReadAlignChunk_processChunks.cpp:160-189)"""
    import os
    from tests.conftest import GOLD
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn",
                    os.path.join(root, "tests", "data", "small_extra",
                                 "reads_ml.fa"),
                    "--outSAMunmapped", "Within",
                    "--outFileNamePrefix", prefix])
    align_reads(P, use_device=False)
    got = [l for l in open(prefix + "Aligned.out.sam") if not l.startswith("@")]
    want = [l for l in open(os.path.join(root, "tests", "golden", "small",
                                         "fasta_ml", "Aligned.out.sam"))
            if not l.startswith("@")]
    assert got == want
