"""Chimeric detection: Chimeric.out.junction must match the reference."""
import os

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
