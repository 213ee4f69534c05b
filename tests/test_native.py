"""Native C++ suffix sorter must match the numpy reference sorter exactly."""
import numpy as np
import pytest

from star_tpu.genome.native import native_available, sort_suffixes_native


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_sorter_matches(genome_index, genome_index_gtf):
    for gi in (genome_index, genome_index_gtf):
        sa = sort_suffixes_native(gi.t2, 2)
        assert np.array_equal(sa, gi.sa)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_sorter_random_text():
    rng = np.random.default_rng(5)
    # random text with interior Ns and spacer runs
    t2 = rng.integers(0, 4, size=50000).astype(np.int8)
    t2[rng.integers(0, len(t2), 200)] = 4
    t2[1000:1100] = 5
    t2[30000:30050] = 5
    import star_tpu.genome.generate as gen
    # numpy reference path (bypass native)
    import star_tpu.genome.native as nat
    sa_np = gen.sort_suffixes.__wrapped__(t2) if hasattr(gen.sort_suffixes, "__wrapped__") else None
    if sa_np is None:
        # call the numpy body by disabling native
        import os
        old = os.environ.get("STAR_TPU_NATIVE")
        nat._tried = False
        nat._lib = None
        os.environ["STAR_TPU_NATIVE"] = "0"
        sa_np = gen.sort_suffixes(t2)
        if old is None:
            del os.environ["STAR_TPU_NATIVE"]
        else:
            os.environ["STAR_TPU_NATIVE"] = old
        nat._tried = False
        nat._lib = None
    sa_nat = sort_suffixes_native(t2, 2)
    assert np.array_equal(sa_np, sa_nat)


def test_chunked_sort_matches_inram(tmp_path):
    """disk-spill chunked sorter (mammal-scale path) must produce the exact
    same SA as the in-RAM sorter; a tiny ram cap forces many chunks"""
    from star_tpu.genome.native import (native_available,
                                        sort_suffixes_chunked,
                                        sort_suffixes_native)
    if not native_available():
        import pytest
        pytest.skip("native lib unavailable")
    import numpy as np
    rng = np.random.default_rng(7)
    # genome with repeats, Ns and chromosome spacers
    g = rng.integers(0, 4, size=50000).astype(np.int8)
    g[1000:1300] = g[4000:4300]           # repeat
    g[2000:2010] = 4                      # Ns
    g[25000] = 5                          # spacer (chr boundary)
    from star_tpu.genome.fasta import build_t2
    t2 = build_t2(g)
    ref = sort_suffixes_native(t2)
    out = str(tmp_path / "sa.i64")
    # ~3000 rows per chunk -> dozens of chunks
    got = sort_suffixes_chunked(t2, out, ram_cap_bytes=3000 * 8)
    assert got is not None
    assert len(got) == len(ref)
    assert np.array_equal(np.asarray(got), ref)
