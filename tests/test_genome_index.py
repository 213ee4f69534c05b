"""Index build parity: our generated SA/SAi must match the reference index
bit-for-bit on the test genome."""
import os

import numpy as np
import pytest

from tests.conftest import DATA, GOLD


def test_generated_index_matches_reference(genome_index):
    from star_tpu.genome.index import GenomeIndex
    gi = GenomeIndex.generate([os.path.join(DATA, "genome.fa")], sa_index_nbases=8)
    ref = genome_index
    assert np.array_equal(gi.G, ref.G)
    assert np.array_equal(gi.sa, ref.sa)
    assert np.array_equal(gi.sai_val, ref.sai_val)
    assert np.array_equal(gi.sai_absent, ref.sai_absent)
    assert np.array_equal(gi.sai_nbit, ref.sai_nbit)
    assert gi.chr_name == ref.chr_name
    assert np.array_equal(gi.chr_start, ref.chr_start)


def test_native_save_load_roundtrip(tmp_path, genome_index):
    from star_tpu.genome.index import GenomeIndex
    genome_index.save(str(tmp_path))
    gi2 = GenomeIndex.load(str(tmp_path))
    assert np.array_equal(gi2.sa, genome_index.sa)
    assert np.array_equal(gi2.G, genome_index.G)
    assert gi2.chr_name == genome_index.chr_name


def test_t2_semantics(genome_index):
    gi = genome_index
    n = gi.n_genome
    # forward half = genome, reverse half = revcomp
    assert np.array_equal(gi.t2[:n], gi.G)
    g0 = gi.G[gi.G < 4]
    t0 = gi.t2[n:][::-1]
    t0 = t0[t0 < 4]
    assert np.array_equal(3 - t0[::-1][::-1], 3 - t0)  # sanity

    # every SA suffix starts with a real nucleotide and is sorted
    assert (gi.t2[gi.sa] < 4).all()


def test_sparse_index_matches_reference():
    """--genomeSAsparseD 2: SA rows + SAi tables bit-identical to the
    reference sparse index (incl. the skip-scan last-row quirk)"""
    from star_tpu.genome.index import GenomeIndex
    ref = GenomeIndex.load(os.path.join(GOLD, "genome_idx_sp2"))
    assert ref.sa_sparse_d == 2
    gi = GenomeIndex.generate([os.path.join(DATA, "genome.fa")],
                              sa_index_nbases=8, sa_sparse_d=2)
    assert np.array_equal(gi.sa, ref.sa)
    assert np.array_equal(gi.sai_val, ref.sai_val)
    assert np.array_equal(gi.sai_absent, ref.sai_absent)
    assert np.array_equal(gi.sai_nbit, ref.sai_nbit)


@pytest.mark.parametrize("sub,reads", [
    ("se_sp2", ["reads_se.fastq"]),
    ("pe_sp2", ["reads_pe_1.fastq", "reads_pe_2.fastq"]),
])
def test_sparse_align_golden(tmp_path, sub, reads, use_device):
    """alignment against a sparse suffix array: phase-offset MMP search
    (reference ReadAlign_maxMappableLength2strands.cpp:18-113) must give
    byte-identical SAM + SJ vs the reference run on the same sparse index"""
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx_sp2"),
                    "--readFilesIn"] + [os.path.join(DATA, r) for r in reads]
                   + ["--outFileNamePrefix", prefix,
                      "--outSAMunmapped", "Within"])
    align_reads(P, use_device=use_device)
    got = [l for l in open(prefix + "Aligned.out.sam") if not l.startswith("@")]
    want = [l for l in open(os.path.join(GOLD, sub, "Aligned.out.sam"))
            if not l.startswith("@")]
    assert got == want
    assert (open(prefix + "SJ.out.tab").read()
            == open(os.path.join(GOLD, sub, "SJ.out.tab")).read())
