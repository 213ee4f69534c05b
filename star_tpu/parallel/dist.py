"""Multi-host (multi-process) runtime: DCN batch sharding + table merges.

The reference scales only by threads in one process (SURVEY.md section 2.3);
multi-node was "run independent STAR processes per sample".  The TPU-native
scale-out is a jax.distributed single-controller program: every host feeds
its slice of the read batch (batch dim sharded over "dp", which maps to DCN
across hosts), the suffix-array shards live on the "ix" axis (ICI), and the
result tables that the reference merges thread-0-wise (SJ junction counts,
solo per-CB counts, gene counts — source/STAR.cpp:258-265, outputSJ.cpp,
SoloFeature_sumThreads.cpp) are merged with psum collectives.

This module is exercised by tests/test_distributed.py, which launches two
real processes with 4 virtual CPU devices each and requires bit-identical
results vs the single-process oracle.
"""
from __future__ import annotations

import os
import sys

import numpy as np


def init_distributed(coordinator: str, num_processes: int, process_id: int,
                     local_device_count: int = None):
    """initialize the jax multi-process runtime (CPU backend uses virtual
    devices; TPU backends autodetect)."""
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{local_device_count}").strip()
    import jax
    if local_device_count is not None:
        # the environment may pin the real accelerator backend in
        # sitecustomize; virtual-device runs must override programmatically
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax


def merge_keyed_counts(local_keys: np.ndarray, local_counts: np.ndarray,
                       mesh):
    """merge per-host keyed count tables (SJ junction counts, solo per-CB
    counts) across the "dp" axis: the key sets are unioned host-side (small,
    DCN gather) and the count columns ride an on-mesh psum — the multi-host
    analog of the reference's thread-0 merges (outputSJ.cpp:20-80,
    SoloFeature_sumThreads.cpp).  Returns (all_keys sorted unique, merged
    counts [K, ...] identical on every process)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    n_proc = jax.process_count()
    # pad to a common length, gather key sets from every process.  jax runs
    # with x64 off, so int64 keys ship as two int32 limbs (exact for any
    # 64-bit key, e.g. human junction coordinates)
    lens = multihost_utils.process_allgather(
        np.array([len(local_keys)], np.int32))
    kmax = max(int(np.asarray(lens).max()), 1)
    kp = np.zeros((kmax, 2), np.int32)
    k64 = local_keys.astype(np.int64)
    kp[:len(local_keys), 0] = (k64 & 0xFFFFFFFF) - (1 << 31)
    kp[:len(local_keys), 1] = (k64 >> 32) + 1    # +1 marks a real row
    gk = np.asarray(multihost_utils.process_allgather(kp)).reshape(-1, 2)
    real = gk[:, 1] != 0
    rk = ((gk[real, 1].astype(np.int64) - 1) << 32) \
        | ((gk[real, 0].astype(np.int64) + (1 << 31)) & 0xFFFFFFFF)
    all_keys = np.unique(rk)

    # dense local rows aligned to the global key set: this process's table
    # sits in its first owned dp row, its other rows (if any) stay zero.
    # int64 counts ride the psum as 16-bit limbs (exact under x64-off).
    D = mesh.shape["dp"]
    rows_local = D // max(n_proc, 1)
    block = np.zeros((rows_local, len(all_keys)) + local_counts.shape[1:],
                     np.uint64)
    pos = np.searchsorted(all_keys, local_keys)
    block[0, pos] = local_counts.astype(np.uint64)
    limbs = np.stack([((block >> (16 * i)) & 0xFFFF).astype(np.int32)
                      for i in range(4)], axis=1)   # [rows, 4, K, ...]

    def merge(x):
        return jax.lax.psum(x.sum(axis=0), "dp")

    mapped = jax.shard_map(merge, mesh=mesh, in_specs=P("dp"),
                           out_specs=P(), check_vma=False)
    g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), limbs)
    out = np.asarray(jax.jit(mapped)(g).addressable_shards[0].data)
    merged = sum(out[i].astype(np.int64) << (16 * i) for i in range(4))
    return all_keys, merged.astype(local_counts.dtype)


def _worker_main(argv):
    """test worker: sharded MMP over a globally batch-sharded query set +
    psum merges of keyed tables, from one of N processes."""
    coordinator, n_proc, pid = argv[0], int(argv[1]), int(argv[2])
    idx_dir, query_file, out_file = argv[3], argv[4], argv[5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax = init_distributed(coordinator, n_proc, pid, local_device_count=4)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from star_tpu.genome.index import GenomeIndex
    from star_tpu.parallel.mesh import make_mesh, ShardedIndex, \
        make_sharded_mmp

    gi = GenomeIndex.load_reference_dir(idx_dir)
    devices = jax.devices()
    assert len(devices) == 4 * n_proc, len(devices)
    mesh = make_mesh(devices, dp=n_proc, ix=4)
    si = ShardedIndex.build(gi, mesh, ql=128)
    mmp = make_sharded_mmp(si)

    z = np.load(query_file)
    qs, qlens = z["qs"], z["qlens"]
    B = len(qs)
    loc = slice(pid * B // n_proc, (pid + 1) * B // n_proc)
    shard_q = NamedSharding(mesh, P("dp", None))
    shard_v = NamedSharding(mesh, P("dp"))
    g_qs = jax.make_array_from_process_local_data(shard_q, qs[loc])
    g_ql = jax.make_array_from_process_local_data(shard_v, qlens[loc])
    out = mmp(g_qs, g_ql)
    # outputs are sharded over "dp" and replicated over "ix": this process's
    # rows are any one of its addressable (per-ix) copies
    local = [np.asarray(o.addressable_shards[0].data) for o in out]

    # keyed-table psum merge: per-process partial SJ-style count tables with
    # overlapping key sets -> identical replicated totals on every process
    # (the DCN analog of the reference's thread-0 SJ/solo merges)
    rng = np.random.default_rng(100 + pid)
    keys = np.unique(rng.integers(0, 40, size=12).astype(np.int64))
    cnts = rng.integers(1, 9, size=(len(keys), 2)).astype(np.int64)
    all_keys, merged = merge_keyed_counts(keys, cnts, mesh)

    np.savez(out_file, maxl=local[0], nrep=local[1], lo=local[2],
             hi=local[3], keys=keys, cnts=cnts, all_keys=all_keys,
             merged=merged)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    _worker_main(sys.argv[1:])
