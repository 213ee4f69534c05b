"""Sharded-index seed search on a virtual 8-device CPU mesh must be
bit-identical to the host reference implementation."""
import numpy as np
import pytest

import jax

from star_tpu.align.seed import mmp_search


def _make_queries(gi, n, seed=0, ql=256):
    rng = np.random.default_rng(seed)
    qs = np.full((n, ql), -1, dtype=np.int8)
    qlens = np.zeros(n, dtype=np.int32)
    for b in range(n):
        if b % 3 == 0:
            ln = int(rng.integers(6, 100))
            q = rng.integers(0, 4, size=ln).astype(np.int8)
        else:
            p0 = int(rng.integers(0, gi.n_genome - 200))
            ln = int(rng.integers(6, 100))
            q = gi.t2[p0:p0 + ln].copy()
            if (q >= 4).any():
                q = rng.integers(0, 4, size=ln).astype(np.int8)
            elif b % 5 == 0 and ln > 10:
                q[int(rng.integers(2, ln - 2))] = int(rng.integers(0, 4))
        qs[b, :len(q)] = q
        qlens[b] = len(q)
    return qs, qlens


def test_device_kernel_matches_host(genome_index):
    from star_tpu.ops.sa_search import DeviceIndex, make_mmp_kernel
    gi = genome_index
    di = DeviceIndex.build(gi, ql=128)
    kern = make_mmp_kernel(di)
    qs, qlens = _make_queries(gi, 256, ql=128)
    maxl, nrep, lo, hi = [np.asarray(x) for x in kern(qs, qlens)]
    for b in range(len(qs)):
        assert (int(maxl[b]), int(nrep[b]), int(lo[b]), int(hi[b])) == \
            mmp_search(gi, qs[b, :qlens[b]]), b


@pytest.mark.parametrize("dp,ix", [(2, 4), (1, 8), (4, 2)])
def test_sharded_mmp_matches_host(genome_index, dp, ix):
    from star_tpu.parallel.mesh import make_mesh, ShardedIndex, make_sharded_mmp
    gi = genome_index
    assert len(jax.devices()) >= dp * ix
    mesh = make_mesh(jax.devices()[:dp * ix], dp=dp, ix=ix)
    si = ShardedIndex.build(gi, mesh, ql=128)
    mmp = make_sharded_mmp(si)
    qs, qlens = _make_queries(gi, 64, seed=7, ql=128)
    maxl, nrep, lo, hi = [np.asarray(x) for x in mmp(qs, qlens)]
    for b in range(len(qs)):
        assert (int(maxl[b]), int(nrep[b]), int(lo[b]), int(hi[b])) == \
            mmp_search(gi, qs[b, :qlens[b]]), b


def test_device_pipeline_golden_se(tmp_path):
    import os
    from tests.conftest import DATA, GOLD
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn", os.path.join(DATA, "reads_se.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--outSAMunmapped", "Within",
                    "--readMapNumber", "60"])
    align_reads(P, use_device=True)
    got = [l for l in open(prefix + "Aligned.out.sam") if not l.startswith("@")]
    want = [l for l in open(os.path.join(GOLD, "se", "Aligned.out.sam"))
            if not l.startswith("@")]
    # first 60 reads only
    names = {l.split("\t")[0] for l in got}
    want60 = [l for l in want if l.split("\t")[0] in names]
    assert got == want60


def test_sharded_end_to_end_golden(tmp_path):
    """full pipeline with --tpuShardedIndex 1 on the 8-device CPU mesh:
    SAM + SJ + psum-merged gene counts byte-identical to reference goldens"""
    import os
    from tests.conftest import DATA, GOLD
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/"
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx_gtf"),
                    "--readFilesIn", os.path.join(DATA, "reads_se.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--outSAMunmapped", "Within", "--quantMode", "GeneCounts",
                    "--tpuShardedIndex", "1", "--tpuBatchSize", "128"])
    align_reads(P, use_device=True)
    got = [l for l in open(prefix + "Aligned.out.sam") if not l.startswith("@")]
    want = [l for l in open(os.path.join(GOLD, "se_gtf", "Aligned.out.sam"))
            if not l.startswith("@")]
    assert got == want
    assert (open(prefix + "SJ.out.tab").read()
            == open(os.path.join(GOLD, "se_gtf", "SJ.out.tab")).read())
    assert (open(prefix + "ReadsPerGene.out.tab").read()
            == open(os.path.join(GOLD, "se_quant", "ReadsPerGene.out.tab")).read())


def test_sharded_mmp_int64_path(genome_index, monkeypatch):
    """mammal-scale addressing: force the big (int64 positions/rows) layout
    on the small genome and require bit-parity — any stray int32 cast in the
    sharded path changes dtypes and breaks this trace"""
    import numpy as _np
    import star_tpu.parallel.mesh as mm
    gi = genome_index
    mesh = mm.make_mesh(jax.devices()[:8], dp=2, ix=4)
    # construct the big layout directly (small genome, int64 dtypes + G-only
    # text), exactly what ShardedIndex.build produces past the 2^31 threshold
    ix = 4
    S = -(-gi.n_sa // ix)
    sa_pad = _np.full(ix * S, gi.n_sa - 1, dtype=_np.int64)
    sa_pad[:gi.n_sa] = gi.sa
    import contextlib
    from jax.sharding import NamedSharding, PartitionSpec as P
    with jax.enable_x64(True):
        t2p = _np.concatenate([gi.G, _np.full(128, 5, dtype=_np.int8)])
        si = mm.ShardedIndex(
            mesh=mesh,
            t2=jax.device_put(t2p, NamedSharding(mesh, P())),
            g_only=True, n_genome=gi.n_genome,
            sa=jax.device_put(sa_pad, NamedSharding(mesh, P("ix"))),
            sai_val=jax.device_put(gi.sai_val.astype(_np.int64),
                                   NamedSharding(mesh, P())),
            sai_absent=jax.device_put(gi.sai_absent, NamedSharding(mesh, P())),
            sai_nbit=jax.device_put(gi.sai_nbit, NamedSharding(mesh, P())),
            level_start=tuple(int(x) for x in gi.sai_level_start),
            n_sa=gi.n_sa, n_levels=gi.sa_index_nbases, ql=128,
            shard_rows=S, big=True)
    mmp = mm.make_sharded_mmp(si)
    qs, qlens = _make_queries(gi, 64, seed=3, ql=128)
    maxl, nrep, lo, hi = [np.asarray(x) for x in mmp(qs, qlens)]
    assert lo.dtype == np.int64 and hi.dtype == np.int64
    for b in range(len(qs)):
        assert (int(maxl[b]), int(nrep[b]), int(lo[b]), int(hi[b])) == \
            mmp_search(gi, qs[b, :qlens[b]]), b
