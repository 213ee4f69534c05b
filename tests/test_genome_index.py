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
