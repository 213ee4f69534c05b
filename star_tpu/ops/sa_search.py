"""Batched MMP seed search on device (JAX + Pallas DMA fetch).

Thousands of (read, start, direction) probes are resolved per dispatch:
SAi prefix descent, then binary search over the suffix array of the doubled
text T2.  One uniform byte comparator covers all read-direction x
genome-strand cases (see genome/fasta.py build_t2).  Results are
bit-identical to the host reference (star_tpu.align.seed.mmp_search); tests
enforce this.

Round-2 redesign: every random access goes through ops.fetch (one aligned
async DMA per row, ~90ns, vs ~2.6us for XLA's serialized gather), suffix
bytes are realigned with a gather-free barrel shifter, the SAi value+flag
bits are packed into one int32 entry so the whole prefix lookup is a single
fetch, and every search loop is a converging `lax.while_loop` instead of a
fixed worst-case trip count (SAi already shrinks intervals to a handful of
rows, so the typical bisection converges in 2-4 steps).

Reference behavior replicated: source/ReadAlign_maxMappableLength2strands.cpp
(SAi descent + the 3 result cases), source/SuffixArrayFuns.cpp:133-207
(maxMappableLength double binary search).  The index arrays live in HBM as
device-resident arrays (the analog of the reference's shared-memory genome
residency, source/SharedMemory.cpp).

Capacity: the single-chip kernel requires n_sa < 2^30 and every table
< 2 GiB (int32 byte offsets); mammal-scale genomes exceed single-chip HBM
anyway and go through the sharded path (parallel/mesh.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .fetch import (FET, TILE, default_use_pallas, extract_i32, fetch_rows,
                    pad_table, realign)

_VAL_MASK = 0x3FFFFFFF   # packed SAi: low 30 bits = value
_NBIT = 1 << 30          # bit 30 = prefix crosses an N/spacer
# bit 31 (sign) = prefix absent


def pack_sai(gi) -> np.ndarray:
    """SAi (value, absent, nbit) planes -> one int32 entry per slot"""
    assert gi.n_sa < _NBIT, "packed SAi requires n_sa < 2^30 (use sharded path)"
    v = gi.sai_val.astype(np.int64) & _VAL_MASK
    v |= gi.sai_nbit.astype(np.int64) << 30
    v |= gi.sai_absent.astype(np.int64) << 31
    return v.astype(np.uint32).view(np.int32)


@dataclass
class DeviceIndex:
    """device-resident genome index arrays (byte-fetchable layout)"""
    t2f: jax.Array         # int8, padded (genome doubled text)
    saf: jax.Array         # int8 view of int32 SA rows, padded
    saif: jax.Array        # int8 view of packed-int32 SAi, padded
    level_start: tuple     # python ints, len L+1
    n_sa: int
    n_levels: int
    ql: int                # max query length (padded compare window)
    use_pallas: bool

    @classmethod
    def build(cls, gi, ql: int = 512, device=None, use_pallas=None):
        assert ql <= TILE, "query window must fit one fetch tile"
        assert 2 * gi.n_genome + ql < 2**31 and gi.n_sa < _VAL_MASK, \
            "single-chip device index requires <2GiB tables (use sharded path)"
        if use_pallas is None:
            use_pallas = default_use_pallas()
        put = lambda a: jax.device_put(a, device)
        return cls(
            t2f=put(pad_table(gi.t2)),
            saf=put(pad_table(gi.sa.astype(np.int32))),
            saif=put(pad_table(pack_sai(gi))),
            level_start=tuple(int(x) for x in gi.sai_level_start),
            n_sa=gi.n_sa,
            n_levels=gi.sa_index_nbases,
            ql=ql,
            use_pallas=use_pallas,
        )


def _onehot_pick(consts: jax.Array, idx: jax.Array) -> jax.Array:
    """consts[idx] for a tiny constant table, gather-free"""
    sel = idx[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (idx.shape[0], consts.shape[0]), 1)
    return jnp.sum(jnp.where(sel, consts[None, :], 0), axis=1)


def make_mmp_fn(di: DeviceIndex):
    """returns a traceable fn
        mmp(t2f, saf, saif, queries [B, QL] int8 (-1 padded), qlen [B] i32)
          -> (maxL, nrep, lo, hi) each [B] int32
    suitable for use inside a larger jit (the device seed loop)."""
    L = di.n_levels
    QL = di.ql
    n_sa = di.n_sa
    lvl_start = jnp.array(di.level_start[:-1], dtype=jnp.int32)   # [L]
    lvl_end = jnp.array(di.level_start[1:], dtype=jnp.int32)      # [L]
    up = di.use_pallas

    def lcp_lt(g, qpad, qlen):
        """lcp(query, suffix bytes g) and suffix<query, over the QL window.
        qpad padding: -1 => query smaller (prefix semantics), 127 => larger."""
        neq = qpad != g
        has = neq.any(axis=1)
        first = jnp.argmax(neq, axis=1)
        lcp = jnp.minimum(jnp.where(has, first, QL), qlen)
        sel = first[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, qpad.shape, 1)
        qc = jnp.sum(jnp.where(sel, qpad, 0), axis=1, dtype=jnp.int32)
        gc = jnp.sum(jnp.where(sel, g, 0), axis=1, dtype=jnp.int32)
        return lcp.astype(jnp.int32), has & (gc < qc)

    def suffix_window(t2f, saf, rows, run):
        """SA rows -> realigned suffix byte windows [B, QL]"""
        sbyte = rows * 4
        srows = fetch_rows(saf, jnp.where(run, sbyte, -1), use_pallas=up)
        pos = extract_i32(srows, sbyte % TILE)
        trows = fetch_rows(t2f, jnp.where(run, pos, -1), use_pallas=up)
        return realign(trows, pos % TILE, QL)

    def lower_bound(t2f, saf, qpad, qlen, lo0, hi0, budget):
        """first row in [lo0, hi0) whose suffix >= query.  The loop converges
        per lane; `budget` caps the lockstep iterations so one wide-interval
        lane cannot stall the whole batch — lanes still open at the cap are
        reported unconverged and the host re-dispatches just those."""
        def cond(st):
            lo, hi, it = st
            return jnp.any(lo < hi) & (it < budget)

        def body(st):
            lo, hi, it = st
            run = lo < hi
            mid = (lo + hi) // 2
            g = suffix_window(t2f, saf, mid, run)
            _, lt = lcp_lt(g, qpad, qlen)
            lo = jnp.where(run & lt, mid + 1, lo)
            hi = jnp.where(run & ~lt, mid, hi)
            return lo, hi, it + 1

        lo, hi, _ = jax.lax.while_loop(cond, body,
                                       (lo0, hi0, jnp.int32(0)))
        return lo, lo < hi

    def mmp(t2f, saf, saif, queries, qlen, valid=None, budget=None):
        B = queries.shape[0]
        q = jnp.maximum(queries, -1)
        qlen = qlen.astype(jnp.int32)
        if valid is None:
            valid = jnp.ones(B, dtype=bool)
        bounded = budget is not None
        if budget is None:
            budget = jnp.int32(1 << 30)

        # ---- SAi prefix values at each level (base-4 over raw byte codes,
        # bug-compatible with the reference's unchecked index arithmetic)
        qn = jnp.where(q[:, :L] < 0, 0, q[:, :L]).astype(jnp.int32)
        prefix_vals = []
        acc = jnp.zeros(B, dtype=jnp.int32)
        for l in range(L):
            acc = acc * 4 + qn[:, l]
            prefix_vals.append(acc)
        prefix_vals = jnp.stack(prefix_vals, axis=1)  # [B, L]; level l+1 at col l

        lmax = jnp.minimum(qlen, L).astype(jnp.int32)
        sel0 = jnp.maximum(lmax - 1, 0)[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (B, L), 1)
        ind0 = jnp.sum(jnp.where(sel0, prefix_vals, 0), axis=1)

        # ---- SAi descent (reference: reduce Lind while prefix absent);
        # typically resolves in one fetch because full-depth prefixes of real
        # reads are present
        def d_cond(st):
            return jnp.any(~st[2]) & (st[6] < budget)

        def d_body(st):
            lind, ind, done, v1, v2, off, it = st
            off_n = _onehot_pick(lvl_start, lind - 1) + ind
            rows = fetch_rows(saif, jnp.where(done, -1, off_n * 4), use_pallas=up)
            rb = (off_n * 4) % TILE
            v1_n = extract_i32(rows, rb)
            v2_n = extract_i32(rows, rb + 4)
            v1 = jnp.where(done, v1, v1_n)
            v2 = jnp.where(done, v2, v2_n)
            off = jnp.where(done, off, off_n)
            absent = v1 < 0
            step = ~done & absent & (lind > 1)
            done = done | ~absent | (lind <= 1)
            lind = jnp.where(step, lind - 1, lind)
            ind = jnp.where(step, ind >> 2, ind)
            return lind, ind, done, v1, v2, off, it + 1

        z = jnp.zeros(B, dtype=jnp.int32)
        lind, _, d_done, v1, v2, off, _ = jax.lax.while_loop(
            d_cond, d_body,
            (jnp.maximum(lmax, 1), ind0, ~valid, z, z, z, jnp.int32(0)))

        isa1 = v1 & _VAL_MASK
        no_n = (v1 & _NBIT) == 0
        has_next = off + 1 < _onehot_pick(lvl_end, lind - 1)
        good = has_next & (v2 >= 0)
        isa2 = jnp.where(good, (v2 & _VAL_MASK) - 1, n_sa - 1)
        # Tight search bound even when the next SAi entry is absent: absent
        # entries store the next PRESENT block start, so rows with this
        # prefix still end at value-1.  The reference searches [iSA1, nSA-1]
        # there ("safe, but can probably do better"); the result is provably
        # identical because the query starts with the present prefix, so its
        # insertion point, lcp neighbors and equal range all live inside the
        # tight interval.  Only the returned bounds of a 0-length match use
        # the reference's loose i2 (see below).
        i2s = jnp.where(has_next, (v2 & _VAL_MASK) - 1, n_sa - 1)

        case1 = ((lind < L) & no_n & good) | ~valid
        case2 = ~case1 & (isa1 == isa2) & no_n & good
        # case 4 — search-free resolution the reference misses: if the
        # descent stopped below Lmax, the (Lind+1)-prefix is ABSENT, i.e. no
        # suffix extends the match past Lind, so maxL == Lind exactly and the
        # equal range is the whole SAi block [isa1, i2s] (which by SA order
        # also contains the N-continuation rows a prefix-compare would keep).
        # Same when Lind == qlen: the full query matched at SAi level.
        # Requires has_next so the block end is known.  The reference runs
        # its full double binary search here with provably identical output.
        case4 = ~case1 & ~case2 & has_next & ((lind < lmax) | (lind >= qlen))
        case3 = ~case1 & ~case2 & ~case4
        l0 = jnp.where(good & no_n, lind, 0)

        # ---- case-3 insertion-point search in [i1, i2s]
        i1, i2 = isa1, i2s
        lo0 = jnp.where(case3, i1, 0)
        hi0 = jnp.where(case3, i2 + 1, 0)
        ins, unc_i = lower_bound(t2f, saf, q, qlen, lo0, hi0, budget)

        # ---- neighbor lcps (case 3) + the case-2 single compare, one batch
        rows_a = jnp.where(case2, isa1, jnp.minimum(ins, i2))
        rows_b = jnp.where(case2, isa1, jnp.maximum(ins - 1, i1))
        run_a = case2 | (case3 & (ins <= i2))
        run_b = case3 & (ins - 1 >= i1)
        g2 = suffix_window(t2f, saf,
                           jnp.concatenate([rows_a, rows_b]),
                           jnp.concatenate([run_a, run_b]))
        l2, _ = lcp_lt(g2, jnp.concatenate([q, q]),
                       jnp.concatenate([qlen, qlen]))
        l_a = jnp.where(run_a, l2[:B], 0)
        l_b = jnp.where(run_b, l2[B:], 0)
        best = jnp.maximum(jnp.maximum(l_a, l_b), jnp.where(case3, l0, 0))

        # ---- equal range of the best prefix within [i1, i2] (case 3)
        nz = case3 & (best > 0)
        pos_idx = jnp.arange(QL, dtype=jnp.int32)[None, :]
        keep = pos_idx < best[:, None]
        q_lo = jnp.where(keep, q, -1)
        q_hi = jnp.where(keep, q, 127)
        qr = jnp.concatenate([q_lo, q_hi], axis=0)
        b0 = jnp.concatenate([jnp.where(nz, i1, 0)] * 2)
        b1 = jnp.concatenate([jnp.where(nz, i2 + 1, 0)] * 2)
        bounds, unc_e = lower_bound(t2f, saf, qr,
                                    jnp.concatenate([best, best]),
                                    b0, b1, budget)
        # a 0-length match reports the reference's loose [iSA1, iSA2] bounds
        lo1 = jnp.where(nz, bounds[:B], isa1)
        hi1 = jnp.where(nz, bounds[B:] - 1, isa2)

        # ---- combine the cases
        max_l = jnp.where(case1 | case4, lind,
                          jnp.where(case2, l_a, jnp.where(nz, best, 0)))
        lo_out = jnp.where(case1 | case2 | case4, isa1, lo1)
        hi_out = jnp.where(case1, isa2,
                           jnp.where(case2, isa1,
                                     jnp.where(case4, i2s, hi1)))
        nrep = hi_out - lo_out + 1
        if not bounded:
            return max_l, nrep, lo_out, hi_out
        unconv = valid & (~d_done | unc_i | unc_e[:B] | unc_e[B:])
        return max_l, nrep, lo_out, hi_out, unconv

    return mmp


def make_mmp_kernel(di: DeviceIndex):
    """returns jitted fn: (queries [B, QL] int8 with -1 padding, qlen [B]
    int32) -> (maxL, nrep, lo, hi) each [B] int32."""
    mmp = make_mmp_fn(di)
    jitted = jax.jit(mmp)

    def call(queries, qlen):
        # index arrays are passed as runtime args (NOT closure constants:
        # constant-capture would bake them into the HLO as literals, making
        # compiles and every execution pathologically slow)
        return jitted(di.t2f, di.saf, di.saif, queries, qlen)

    return call

