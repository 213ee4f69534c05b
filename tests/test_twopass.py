"""Two-pass mode and BySJout filtering must reproduce reference goldens."""
import os

import pytest

from tests.conftest import DATA, GOLD


@pytest.mark.parametrize("mode,extra,gold", [
    ("2pass", ["--twopassMode", "Basic"], "se_2pass"),
    ("bysjout", ["--outFilterType", "BySJout"], "se_bysjout"),
])
def test_mode_golden(tmp_path, genome_index, mode, extra, gold, use_device):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn", os.path.join(DATA, "reads_se.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--outSAMunmapped", "Within", *extra])
    align_reads(P, gi=genome_index, use_device=use_device)
    got = [l for l in open(prefix + "Aligned.out.sam") if not l.startswith("@")]
    want = [l for l in open(os.path.join(GOLD, gold, "Aligned.out.sam"))
            if not l.startswith("@")]
    assert got == want
    with open(prefix + "SJ.out.tab") as a, \
         open(os.path.join(GOLD, gold, "SJ.out.tab")) as b:
        assert a.read() == b.read()


def test_twopass_pass1_sj(tmp_path, genome_index, use_device):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn", os.path.join(DATA, "reads_se.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--outSAMunmapped", "Within", "--twopassMode", "Basic"])
    align_reads(P, gi=genome_index, use_device=use_device)
    with open(prefix + "_STARpass1/SJ.out.tab") as a, \
         open(os.path.join(GOLD, "se_2pass", "_STARpass1", "SJ.out.tab")) as b:
        assert a.read() == b.read()
