"""Multi-chip layout: data-parallel read batches x sharded suffix array.

The reference scales by shared-memory threads on one node (reference:
source/mapThreadsSpawn.cpp, source/SharedMemory.cpp); the TPU-native analog is
a 2-D device mesh:

  * axis "dp": read batches are data-parallel (the batch dimension of every
    probe array is sharded over "dp");
  * axis "ix": the suffix array is row-sharded over "ix" (the 26 GB human SA
    does not fit one chip).  Every device bisects its own SA shard for every
    probe in its "dp" slice; per-shard candidates are combined with mesh
    collectives (max/min reductions over "ix"), which ride ICI.

Correctness of the combine: for rows sorted lexicographically, the longest
common prefix with a query is unimodal around the query's insertion point, so
each shard's boundary-clipped insertion neighbourhood contains its shard-max
lcp, and the global best interval is the contiguous union of per-shard equal
ranges of the best prefix.  Results are bit-identical to the single-chip
kernel (tests/test_sharding.py).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp: int = None, ix: int = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None or ix is None:
        ix = max(1, n // 2) if n > 1 else 1
        dp = n // ix
    assert dp * ix == n, (dp, ix, n)
    dev = np.array(devices[:dp * ix]).reshape(dp, ix)
    return Mesh(dev, ("dp", "ix"))


@dataclass
class ShardedIndex:
    """genome index laid out over a mesh.

    Mammal scale (2*nGenome or nSA >= 2^31): all position/row arrays are
    int64 end-to-end (device_put under an enable_x64 scope; TPUs execute
    s64 as 2x s32) and only the forward genome G is stored — reverse-strand
    suffix bytes are derived per gather as complement(G[2N-1-p]), halving
    the replicated text to ~3.2 GB for human.  The suffix array itself is
    what gets row-sharded over "ix": every shard's rows point anywhere in
    the genome, so the text must be device-local (replicated) for the
    bisection to stay communication-free; the SA is the 26 GB structure
    and sharding it is what makes human-scale fit (SURVEY.md section 2.3)."""
    mesh: Mesh
    t2: jax.Array        # small genomes: doubled text; big: forward G only
    g_only: bool         # t2 stores only G; reverse strand derived on gather
    n_genome: int
    sa: jax.Array        # [ix*S] row-sharded over "ix"
    sai_val: jax.Array   # replicated
    sai_absent: jax.Array
    sai_nbit: jax.Array
    level_start: tuple
    n_sa: int
    n_levels: int
    ql: int
    shard_rows: int      # S = rows per shard
    big: bool            # int64 positions/rows

    @classmethod
    def build(cls, gi, mesh: Mesh, ql: int = 256):
        ix = mesh.shape["ix"]
        S = -(-gi.n_sa // ix)
        big = 2 * gi.n_genome >= 2**31 or gi.n_sa >= 2**31
        sa_pad = np.full(ix * S, gi.n_sa - 1, dtype=np.int64)
        sa_pad[:gi.n_sa] = gi.sa
        sa_pad = sa_pad.astype(np.int64 if big else np.int32)
        if big:
            t2p = np.concatenate([gi.G, np.full(ql, 5, dtype=np.int8)])
        else:
            t2p = np.concatenate([gi.t2, np.full(ql, 5, dtype=np.int8)])
        repl = NamedSharding(mesh, P())
        row = NamedSharding(mesh, P("ix"))
        import contextlib
        ctx = jax.enable_x64(True) if big else contextlib.nullcontext()
        with ctx:
            return cls(
                mesh=mesh,
                t2=jax.device_put(t2p, repl),
                g_only=big,
                n_genome=gi.n_genome,
                sa=jax.device_put(sa_pad, row),
                sai_val=jax.device_put(gi.sai_val.astype(sa_pad.dtype), repl),
                sai_absent=jax.device_put(gi.sai_absent, repl),
                sai_nbit=jax.device_put(gi.sai_nbit, repl),
                level_start=tuple(int(x) for x in gi.sai_level_start),
                n_sa=gi.n_sa, n_levels=gi.sa_index_nbases, ql=ql,
                shard_rows=S, big=big)


def _first_neq(qpad, g, qlen):
    neq = qpad != g
    first = jnp.argmax(neq, axis=1)
    first = jnp.where(neq.any(axis=1), first, qpad.shape[1])
    return jnp.minimum(first, qlen), neq.any(axis=1)


def make_sharded_mmp(si: ShardedIndex):
    """(queries [B, QL] int8 -1-padded, qlen [B] int32) -> (maxL, nrep, lo, hi)

    queries sharded over "dp"; outputs sharded over "dp"; index work sharded
    over "ix" with collective combines."""
    mesh = si.mesh
    L = si.n_levels
    S = si.shard_rows
    n_sa = si.n_sa
    n_iters = max(1, math.ceil(math.log2(S + 1))) + 1
    IDT = jnp.int64 if si.big else jnp.int32   # position/row dtype
    BIGV = (1 << 62) if si.big else (2**31 - 1)
    N = si.n_genome
    _COMP6 = jnp.array([3, 2, 1, 0, 4, 5, 5, 5], dtype=jnp.int8)

    def gather_local(t2, sa_loc, rows):
        pos = jnp.take(sa_loc, rows, mode="clip").astype(IDT)
        idx = pos[:, None] + jnp.arange(si.ql, dtype=IDT)[None, :]
        if not si.g_only:
            return jnp.take(t2, idx, mode="clip")
        # forward-only text: reverse-strand bytes are complement(G[2N-1-j])
        fwd = idx < N
        j = jnp.where(fwd, idx, jnp.clip(2 * N - 1 - idx, 0, N - 1))
        g = jnp.take(t2, jnp.clip(j, 0, t2.shape[0] - 1), mode="clip")
        g = jnp.where(fwd, g, _COMP6[jnp.clip(g, 0, 7)])
        return jnp.where(idx < 2 * N, g, jnp.int8(5))

    def suffix_lt(t2, sa_loc, rows, qpad):
        g = gather_local(t2, sa_loc, rows)
        neq = qpad != g
        first = jnp.argmax(neq, axis=1)
        qc = jnp.take_along_axis(qpad, first[:, None], axis=1)[:, 0]
        gc = jnp.take_along_axis(g, first[:, None], axis=1)[:, 0]
        return gc < qc

    def lower_bound_local(t2, sa_loc, qpad, lo0, hi0):
        def body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) // 2
            lt = suffix_lt(t2, sa_loc, mid, qpad)
            run = lo < hi
            lo = jnp.where(run & lt, mid + 1, lo)
            hi = jnp.where(run & ~lt, mid, hi)
            return lo, hi
        lo, _ = jax.lax.fori_loop(0, n_iters, body, (lo0, hi0))
        return lo

    def lcp_local(t2, sa_loc, rows, qpad, qlen):
        g = gather_local(t2, sa_loc, rows)
        f, _ = _first_neq(qpad, g, qlen)
        return f

    def shard_fn(queries, qlen, sa_loc, t2, sai_val, sai_absent, sai_nbit):
        # runs per device: queries [b, QL] local dp slice; sa_loc [S]
        shard = jax.lax.axis_index("ix").astype(IDT)
        base = shard * S
        q = jnp.maximum(queries, -1)
        B = q.shape[0]

        # SAi lookup (replicated tables; identical on every "ix" member)
        lmax = jnp.minimum(qlen, L)
        qn = jnp.where(q[:, :L] < 0, 0, q[:, :L]).astype(jnp.int32)
        prefix_vals = []
        acc = jnp.zeros(B, dtype=jnp.int32)
        for l in range(L):
            acc = acc * 4 + qn[:, l]
            prefix_vals.append(acc)
        prefix_vals = jnp.stack(prefix_vals, axis=1)
        present = []
        for l in range(1, L + 1):
            off = si.level_start[l - 1] + prefix_vals[:, l - 1]
            ab = jnp.take(sai_absent, off, mode="clip")
            present.append((~ab) & (l <= lmax))
        present = jnp.stack(present, axis=1)
        lind = L - jnp.argmax(present[:, ::-1].astype(jnp.int32), axis=1)
        lind = jnp.where(present.any(axis=1), lind, 1)
        ind1 = jnp.take_along_axis(prefix_vals, (lind - 1)[:, None], axis=1)[:, 0]
        lvl_start = jnp.array(si.level_start[:-1], dtype=jnp.int32)[lind - 1]
        lvl_end = jnp.array(si.level_start[1:], dtype=jnp.int32)[lind - 1]
        off = lvl_start + ind1
        isa1 = jnp.take(sai_val, off, mode="clip").astype(IDT)
        no_n = ~jnp.take(sai_nbit, off, mode="clip")
        has_next = off + 1 < lvl_end
        nxt_absent = jnp.take(sai_absent, jnp.minimum(off + 1, lvl_end - 1), mode="clip")
        good = has_next & ~nxt_absent
        isa2 = jnp.where(good,
                         jnp.take(sai_val, jnp.minimum(off + 1, lvl_end - 1),
                                  mode="clip").astype(IDT) - 1,
                         IDT(n_sa - 1) if si.big else jnp.int32(n_sa - 1))
        case1 = (lind < L) & no_n & good
        case2 = (isa1 == isa2) & no_n & good

        # global range clipped into this shard (local row coordinates)
        i1g, i2g = isa1, isa2
        lo_loc = jnp.clip(i1g - base, 0, S)
        hi_loc = jnp.clip(i2g + 1 - base, 0, S)  # exclusive
        nonempty = lo_loc < hi_loc

        ins = lower_bound_local(t2, sa_loc, q, lo_loc, hi_loc)
        l_a = lcp_local(t2, sa_loc, jnp.minimum(ins, hi_loc - 1), q, qlen)
        l_b = lcp_local(t2, sa_loc, jnp.maximum(ins - 1, lo_loc), q, qlen)
        l_a = jnp.where(nonempty & (ins < hi_loc), l_a, 0)
        l_b = jnp.where(nonempty & (ins - 1 >= lo_loc), l_b, 0)
        local_best = jnp.maximum(l_a, l_b).astype(jnp.int32)
        best = jax.lax.pmax(local_best, "ix")

        pos_idx = jnp.arange(q.shape[1], dtype=jnp.int32)[None, :]
        q_lo = jnp.where(pos_idx < best[:, None], q, -1)
        q_hi = jnp.where(pos_idx < best[:, None], q, 127)
        q2 = jnp.concatenate([q_lo, q_hi], axis=0)
        b0 = jnp.concatenate([lo_loc, lo_loc])
        b1 = jnp.concatenate([hi_loc, hi_loc])
        bounds = lower_bound_local(t2, sa_loc, q2, b0, b1)
        lo1 = bounds[:B] + base
        hi1 = bounds[B:] - 1 + base
        # shards whose slice contains no block rows contribute +inf/-inf
        blk_nonempty = bounds[:B] < bounds[B:]
        lo1 = jnp.where(nonempty & blk_nonempty, lo1, IDT(BIGV))
        hi1 = jnp.where(nonempty & blk_nonempty, hi1, IDT(-BIGV))
        lo1 = -jax.lax.pmax(-lo1, "ix")
        hi1 = jax.lax.pmax(hi1, "ix")
        empty = best == 0
        lo1 = jnp.where(empty, i1g, lo1)
        hi1 = jnp.where(empty, i2g, hi1)

        max_l = jnp.where(case1, lind.astype(jnp.int32), best)
        lo_out = jnp.where(case1 | case2, isa1, lo1)
        hi_out = jnp.where(case1, isa2, jnp.where(case2, isa1, hi1))
        return max_l, hi_out - lo_out + 1, lo_out, hi_out

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("dp", None), P("dp"), P("ix"), P(), P(), P(), P()),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        check_vma=False)

    jitted = jax.jit(mapped)
    import contextlib

    def mmp(queries, qlen):
        # index arrays passed as args (not closure constants) so they are
        # never baked into the HLO; mammal-scale tracing needs x64 live
        ctx = jax.enable_x64(True) if si.big \
            else contextlib.nullcontext()
        with ctx:
            return jitted(queries, qlen, si.sa, si.t2, si.sai_val,
                          si.sai_absent, si.sai_nbit)

    return mmp


def make_sharded_seed_round(si: ShardedIndex):
    """sharded drop-in for ops.pipeline.make_seed_round: one probe round over
    compacted chain lanes, batch dim sharded over "dp", SA bisection sharded
    over "ix".  (chainview [B, QL] int8, offs, seed_len, valid [B])
      -> (maxl, nrep, lo, hi) each [B] int32, numpy."""
    mmp = make_sharded_mmp(si)
    QL = si.ql
    dp = si.mesh.shape["dp"]

    def call(chainview, offs, seed_len, valid):
        B = chainview.shape[0]
        # host-side barrel shift: lane i's bytes from column offs[i], -1 fill
        k = np.arange(QL, dtype=np.int32)[None, :]
        idx = offs[:, None] + k
        q = np.where(idx < QL,
                     np.take_along_axis(chainview, np.minimum(idx, QL - 1),
                                        axis=1), -1).astype(np.int8)
        slen = np.maximum(seed_len, 0)
        q = np.where(k < slen[:, None], q, -1).astype(np.int8)
        qlen = np.where(valid, slen, 0).astype(np.int32)
        pad = (-B) % dp
        if pad:
            q = np.concatenate([q, np.full((pad, QL), -1, np.int8)])
            qlen = np.concatenate([qlen, np.zeros(pad, np.int32)])
        out = mmp(q, qlen)
        maxl, nrep, lo, hi = (np.asarray(x)[:B] for x in out)
        maxl = np.where(valid, maxl, 0)
        return maxl, nrep, lo, hi

    return call


def psum_merge(tables: np.ndarray, mesh: Mesh) -> np.ndarray:
    """merge per-dp-shard partial count tables with an ICI psum collective
    (the TPU-native analog of the reference's thread-0 gene-count reduction,
    source/STAR.cpp:258-265).  tables: [dp, ...] -> summed [...]."""
    dp = mesh.shape["dp"]
    assert tables.shape[0] == dp, (tables.shape, dp)

    def f(x):
        # x: this shard's [dp/dp=1, ...] slice -> replicated sum over "dp"
        return jax.lax.psum(x.sum(axis=0), "dp")

    mapped = jax.shard_map(
        f, mesh=mesh,
        in_specs=P("dp"), out_specs=P(), check_vma=False)
    if np.issubdtype(tables.dtype, np.integer):
        # jax runs with x64 disabled, so int64 inputs would be silently
        # truncated to int32 before the psum.  Decompose into 16-bit limbs
        # (each limb-sum <= dp * 65535, exact in int32), psum each limb, and
        # recombine in int64 on host — exact for any 64-bit counts.
        assert (tables >= 0).all(), "psum_merge: negative counts"
        t = tables.astype(np.uint64)
        limbs = np.stack([((t >> (16 * i)) & 0xFFFF).astype(np.int32)
                          for i in range(4)])
        out = np.asarray(jax.jit(mapped)(np.moveaxis(limbs, 0, 1)))
        # mapped consumed [dp, 4, ...] -> [4, ...]
        total = sum(out[i].astype(np.int64) << (16 * i) for i in range(4))
        return total.astype(tables.dtype)
    return np.asarray(jax.jit(mapped)(tables))
