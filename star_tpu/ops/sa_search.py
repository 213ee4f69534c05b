"""Batched MMP seed search on device (JAX/XLA).

Thousands of (read, start, direction) probes are resolved per dispatch:
SAi prefix lookup, then binary search over the suffix array of the doubled
text T2.  One uniform byte comparator covers all read-direction x
genome-strand cases (see genome/fasta.py build_t2), so each bisection step is
a [B, QL] int8 gather + vector compare — bandwidth-bound, no divergent
control flow.  Results are bit-identical to the host reference
(star_tpu.align.seed.mmp_search); tests enforce this.

The index arrays live in HBM as device-resident constants (the analog of the
reference's shared-memory genome residency, reference: source/SharedMemory.cpp)
and are donated once per process.
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class DeviceIndex:
    """device-resident genome index arrays"""
    t2: jax.Array          # int8 [2N + QL] (spacer padded)
    sa: jax.Array          # int32/int64 [nSA]
    sai_val: jax.Array     # int32 [nSAi]
    sai_absent: jax.Array  # bool [nSAi]
    sai_nbit: jax.Array    # bool [nSAi]
    level_start: tuple     # python ints, len L+1
    n_sa: int
    n_levels: int
    ql: int                # max query length (padded compare window)

    @classmethod
    def build(cls, gi, ql: int = 512, device=None):
        t2p = np.concatenate([gi.t2, np.full(ql, 5, dtype=np.int8)])
        idx_dtype = np.int32 if gi.n_sa < 2**31 and 2 * gi.n_genome < 2**31 else np.int64
        put = functools.partial(jax.device_put, device=device)
        return cls(
            t2=put(t2p),
            sa=put(gi.sa.astype(idx_dtype)),
            sai_val=put(gi.sai_val.astype(idx_dtype)),
            sai_absent=put(gi.sai_absent),
            sai_nbit=put(gi.sai_nbit),
            level_start=tuple(int(x) for x in gi.sai_level_start),
            n_sa=gi.n_sa,
            n_levels=gi.sa_index_nbases,
            ql=ql,
        )


def _n_bisect_iters(n_sa: int) -> int:
    return max(1, math.ceil(math.log2(n_sa + 1))) + 1


def _gather_window(t2, sa, rows, ql):
    """[B] rows -> [B, ql] suffix bytes"""
    pos = jnp.take(sa, rows, mode="clip").astype(jnp.int32)
    idx = pos[:, None] + jnp.arange(ql, dtype=jnp.int32)[None, :]
    return jnp.take(t2, idx, mode="clip")


def _suffix_lt_query(t2, sa, rows, qpad):
    """suffix[rows] < query, byte-lexicographic.  qpad padding conventions:
    -1 beyond the query end => query counts as smaller (prefix semantics),
    127 => query counts as larger."""
    g = _gather_window(t2, sa, rows, qpad.shape[1])
    neq = qpad != g
    first = jnp.argmax(neq, axis=1)
    qc = jnp.take_along_axis(qpad, first[:, None], axis=1)[:, 0]
    gc = jnp.take_along_axis(g, first[:, None], axis=1)[:, 0]
    return gc < qc


def _lcp(t2, sa, rows, qpad, qlen):
    g = _gather_window(t2, sa, rows, qpad.shape[1])
    neq = qpad != g
    first = jnp.argmax(neq, axis=1)
    first = jnp.where(neq.any(axis=1), first, qpad.shape[1])
    return jnp.minimum(first, qlen)


def _lower_bound(t2, sa, qpad, lo0, hi0, n_iters):
    """first row in [lo0, hi0) whose suffix >= query (per batch element)"""
    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        lt = _suffix_lt_query(t2, sa, mid, qpad)
        run = lo < hi
        lo = jnp.where(run & lt, mid + 1, lo)
        hi = jnp.where(run & ~lt, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iters, body, (lo0, hi0))
    return lo


def make_mmp_kernel(di: DeviceIndex):
    """returns jitted fn: (queries [B, QL] int8 with -1 padding, qlen [B] int32)
    -> (maxL, nrep, lo, hi) each [B] int32."""
    L = di.n_levels
    level_start = di.level_start
    n_iters = _n_bisect_iters(di.n_sa)
    n_sa = di.n_sa

    def mmp(t2, sa, sai_val, sai_absent, sai_nbit, queries, qlen):
        B = queries.shape[0]
        q = jnp.maximum(queries, -1)

        # ---- SAi lookup
        lmax = jnp.minimum(qlen, L)
        # prefix values at each level (base-4); level l uses first l chars
        qn = jnp.where(q[:, :L] < 0, 0, q[:, :L]).astype(jnp.int32)
        prefix_vals = []
        acc = jnp.zeros(B, dtype=jnp.int32)
        for l in range(L):
            acc = acc * 4 + qn[:, l]
            prefix_vals.append(acc)
        prefix_vals = jnp.stack(prefix_vals, axis=1)  # [B, L], level l+1 at col l

        present = []
        for l in range(1, L + 1):
            off = level_start[l - 1] + prefix_vals[:, l - 1]
            ab = jnp.take(sai_absent, off, mode="clip")
            present.append((~ab) & (l <= lmax))
        present = jnp.stack(present, axis=1)  # [B, L]
        # largest present level (level-1 single bases always present)
        lind = L - jnp.argmax(present[:, ::-1].astype(jnp.int32), axis=1)
        lind = jnp.where(present.any(axis=1), lind, 1)

        ind1 = jnp.take_along_axis(prefix_vals, (lind - 1)[:, None], axis=1)[:, 0]
        lvl_start = jnp.array(level_start[:-1], dtype=jnp.int32)[lind - 1]
        lvl_end = jnp.array(level_start[1:], dtype=jnp.int32)[lind - 1]
        off = lvl_start + ind1
        isa1 = jnp.take(sai_val, off, mode="clip").astype(jnp.int32)
        no_n = ~jnp.take(sai_nbit, off, mode="clip")

        has_next = off + 1 < lvl_end
        nxt_absent = jnp.take(sai_absent, jnp.minimum(off + 1, lvl_end - 1), mode="clip")
        good = has_next & ~nxt_absent
        isa2 = jnp.where(
            good,
            jnp.take(sai_val, jnp.minimum(off + 1, lvl_end - 1), mode="clip").astype(jnp.int32) - 1,
            n_sa - 1)

        case1 = (lind < L) & no_n & good
        case2 = (isa1 == isa2) & no_n & good

        # ---- full binary search (masked; runs for every probe in lockstep)
        i1 = isa1
        i2 = isa2
        ins = _lower_bound(t2, sa, q, i1, i2 + 1, n_iters)
        l_a = _lcp(t2, sa, jnp.minimum(ins, i2), q, qlen)
        l_b = _lcp(t2, sa, jnp.maximum(ins - 1, i1), q, qlen)
        l_a = jnp.where(ins <= i2, l_a, 0)
        l_b = jnp.where(ins - 1 >= i1, l_b, 0)
        best = jnp.maximum(l_a, l_b).astype(jnp.int32)

        # equal range of the best prefix: one batched double search
        pos_idx = jnp.arange(q.shape[1], dtype=jnp.int32)[None, :]
        q_lo = jnp.where(pos_idx < best[:, None], q, -1)
        q_hi = jnp.where(pos_idx < best[:, None], q, 127)
        q2 = jnp.concatenate([q_lo, q_hi], axis=0)
        lo0 = jnp.concatenate([i1, i1], axis=0)
        hi0 = jnp.concatenate([i2 + 1, i2 + 1], axis=0)
        bounds = _lower_bound(t2, sa, q2, lo0, hi0, n_iters)
        lo1 = bounds[:B]
        hi1 = bounds[B:] - 1
        empty = best == 0
        lo1 = jnp.where(empty, i1, lo1)
        hi1 = jnp.where(empty, i2, hi1)

        # ---- select per case
        max_l = jnp.where(case1, lind.astype(jnp.int32), best)
        lo_out = jnp.where(case1, isa1, jnp.where(case2, isa1, lo1))
        hi_out = jnp.where(case1, isa2, jnp.where(case2, isa1, hi1))
        nrep = hi_out - lo_out + 1
        return max_l, nrep, lo_out, hi_out

    jitted = jax.jit(mmp)

    def call(queries, qlen):
        # index arrays are passed as runtime args (NOT closure constants:
        # constant-capture would bake them into the HLO as literals, making
        # compiles and every execution pathologically slow)
        return jitted(di.t2, di.sa, di.sai_val, di.sai_absent, di.sai_nbit,
                      queries, qlen)

    return call
