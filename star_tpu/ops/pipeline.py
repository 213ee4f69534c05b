"""Device-accelerated alignment pipeline.

Reads are processed in large batches.  The whole seed loop — the reference's
per-read `while unmapped > seedMapMin` MMP iteration
(reference: ReadAlign_mapOneRead.cpp:65-78) — runs on device as ONE jitted
dispatch per batch: every read contributes a set of probe *chains*
(piece x direction x staggered start), a `lax.while_loop` advances all
chains in lockstep (each round = one batched MMP over the suffix array,
ops/sa_search.py), and the per-chain probe tables come back as fixed-shape
arrays.  A vectorized numpy replay then rebuilds the reference-order piece
tables (reference: ReadAlign_storeAligns.cpp) so the downstream
window/stitch stages see bit-identical input.

Windows/stitch/extend run as fixed-shape vectorized array stages over the
whole batch (ops/batch_engine.py); reads outside the static envelope fall
back to the per-read host oracle (align/windows.py + align/stitch.py),
keeping every output byte-identical.
"""
from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..align.engine import ReadAligner, ReadResult
from ..align.seed import SeedResult, quality_split
from .jaxcfg import setup_jax_cache
from .sa_search import DeviceIndex, make_mmp_fn

MAXP = 64  # probes per chain cap (matches the round-1 64-round cap)

# per-phase wall-clock accumulators, enabled with STAR_TPU_TIMING=1
import collections as _collections
import os as _os
import time as _time
TIMING = bool(_os.environ.get("STAR_TPU_TIMING"))
TIMERS = _collections.defaultdict(float)


class _tick:
    def __init__(self, key):
        self.key = key

    def __enter__(self):
        if TIMING:
            self.t0 = _time.time()

    def __exit__(self, *a):
        if TIMING:
            TIMERS[self.key] += _time.time() - self.t0


def timing_report() -> str:
    return " ".join(f"{k}={v:.2f}s" for k, v in sorted(TIMERS.items()))


def _shift_rows(x, s):
    """x[i, s_i:] left-shifted into column 0, -1 fill (barrel shifter)"""
    B, W = x.shape
    for b in range(10):
        k = 1 << b
        if k >= W:
            break
        shifted = jnp.concatenate(
            [x[:, k:], jnp.full((B, k), -1, dtype=x.dtype)], axis=1)
        x = jnp.where((s[:, None] & k) != 0, shifted, x)
    return x


def make_fused_seed_fn(di: DeviceIndex, D: int, NC: int, OCAP: int):
    """the whole reference seed loop (ReadAlign_mapOneRead.cpp:65-78) as ONE
    jitted lax.while_loop over rounds: chains stay device-resident, each
    round probes every live chain (x D sparse phase offsets) and appends the
    probe records to a compact output buffer.  Replaces the per-round
    host-compaction dispatches of _run_chains (each of which paid a remote
    dispatch + D2H round trip); the host downloads one flat probe table at
    the end.  All shapes static: NC chains, OCAP output rows."""
    import jax
    mmp = make_mmp_fn(di)
    QL = di.ql

    def fused(t2f, saf, saif, read_mat, c_read, c_pstart, c_plen, c_dir,
              c_istl, valid0, smin):
        i32 = jnp.int32
        RW = read_mat.shape[1]
        rows = jnp.take(read_mat, c_read, axis=0)          # [NC, RW]
        xr = 3 - rows[:, ::-1]
        fwd = c_dir[:, None] == 0
        xrow = jnp.where(fwd, rows, xr)

        def one_probe(l_mapped, d, active):
            adv = c_istl + l_mapped + d
            start = jnp.where(c_dir == 0, c_pstart + adv,
                              c_pstart + c_plen - 1 - adv)
            slen = c_plen - l_mapped - c_istl - d
            sh = jnp.where(c_dir == 0, start, RW - 1 - start)
            q = _shift_rows(xrow, sh)[:, :QL]
            pos = jax.lax.broadcasted_iota(i32, (NC, QL), 1)
            q = jnp.where(pos < slen[:, None], q, -1)
            run = active & (slen > 0)
            maxl, nrep, lo, hi = mmp(t2f, saf, saif, q,
                                     jnp.maximum(slen, 0), valid=run)
            return maxl, nrep, lo, hi, slen

        def cond(st):
            l_mapped, active, out, n_out, nprobes, mbest_acc, k, ovf = st
            return active.any() & (k < MAXP) & (ovf == 0)

        def body(st):
            l_mapped, active, out, n_out, nprobes, mbest_acc, k, ovf = st
            res = []
            mb = jnp.full(NC, -1, i32)
            for d in range(D):
                maxl, nrep, lo, hi, slen = one_probe(l_mapped, d, active)
                val = d < slen
                res.append((jnp.where(val, maxl, 0), nrep, lo, hi))
                mb = jnp.maximum(mb, jnp.where(val, maxl + d, -1))
            mb = jnp.where(active, jnp.maximum(mb, 0), 0)
            # append D rows per active chain, compacted
            n_act = active.sum().astype(i32)
            idx = jnp.nonzero(active, size=NC, fill_value=NC - 1)[0] \
                .astype(i32)
            blk = jnp.zeros((NC * D, 8), i32)
            for d, (maxl, nrep, lo, hi) in enumerate(res):
                rowvals = jnp.stack(
                    [idx, jnp.full(NC, k, i32), jnp.full(NC, d, i32),
                     jnp.take(maxl, idx), jnp.take(nrep, idx),
                     jnp.take(lo, idx), jnp.take(hi, idx),
                     jnp.zeros(NC, i32)], axis=1)
                blk = blk.at[d::D].set(rowvals)
            out = jax.lax.dynamic_update_slice(out, blk, (n_out, 0))
            n_out = n_out + n_act * D
            ovf = jnp.where(n_out > OCAP - NC * D, 1, ovf)
            nprobes = nprobes + active.astype(i32)
            mbest_acc = jax.lax.dynamic_update_slice(
                mbest_acc, jnp.where(active, mb, 0)[:, None], (0, k))
            l_mapped = l_mapped + jnp.where(active, mb, 0)
            active = active & (mb > 0) \
                & (c_istl + l_mapped + smin < c_plen)
            return (l_mapped, active, out, n_out, nprobes, mbest_acc,
                    k + 1, ovf)

        l0 = jnp.zeros(NC, jnp.int32)
        act0 = valid0 & (c_istl + smin < c_plen)
        st = (l0, act0, jnp.zeros((OCAP, 8), jnp.int32), jnp.int32(0),
              jnp.zeros(NC, jnp.int32), jnp.zeros((NC, MAXP), jnp.int32),
              jnp.int32(0), jnp.int32(0))
        st = jax.lax.while_loop(cond, body, st)
        (l_mapped, active, out, n_out, nprobes, mbest_acc, k, ovf) = st
        return out, n_out, nprobes, mbest_acc, ovf

    return jax.jit(fused)


def make_seed_round(di: DeviceIndex):
    """returns jitted fn for ONE probe round over compacted chain lanes:
        (read_mat [R, RW] int8 device-resident, c_read, start, c_dir, slen,
         valid [B], budget) -> (maxl, nrep, lo, hi, unconv) each [B]
    The chain views are built ON DEVICE from the per-batch read matrix
    (uploaded once): lane i's query bytes are read_mat[c_read_i] at positions
    start_i +/- k, complemented for the reverse search direction.  The round
    loop runs on host so later rounds dispatch only the surviving chains,
    uploading a few int32 descriptors per lane instead of the 128-byte
    chain view (the host->device link is the bottleneck)."""
    mmp = make_mmp_fn(di)
    QL = di.ql

    def seed_round(t2f, saf, saif, read_mat, c_read, start, c_dir, slen,
                   valid, budget):
        RW = read_mat.shape[1]
        rows = jnp.take(read_mat, c_read, axis=0)          # [B, RW]
        xr = 3 - rows[:, ::-1]          # complement of the flipped row
        fwd = c_dir[:, None] == 0
        x = jnp.where(fwd, rows, xr)
        sh = jnp.where(c_dir == 0, start, RW - 1 - start)
        q = _shift_rows(x, sh)[:, :QL]
        pos = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], QL), 1)
        q = jnp.where(pos < slen[:, None], q, -1)
        return mmp(t2f, saf, saif, q, jnp.maximum(slen, 0), valid=valid,
                   budget=budget)

    jitted = jax.jit(seed_round)

    def call(read_mat_dev, c_read, start, c_dir, slen, valid, budget):
        return jitted(di.t2f, di.saf, di.saif, read_mat_dev, c_read, start,
                      c_dir, slen, valid, jnp.int32(budget))

    return call


class DeviceAligner:
    def __init__(self, gi, P, batch_size: int = None):
        self.gi = gi
        self.P = P
        self.batch_size = batch_size or P.tpuBatchSize
        self.host = ReadAligner(gi, P)
        self.di = None
        self.seed_round_budgeted = False
        self._ql = None

    # (genome id, ql) -> (DeviceIndex, seed_round); retracing and relowering
    # a jit costs seconds, so repeated align_reads calls in one process
    # (two-pass, BySJout stage 2, benchmarks) must share one kernel
    _kernel_cache = {}

    def _ensure_kernel(self, max_read_len: int):
        setup_jax_cache()
        ql = ((max_read_len + 2 + 127) // 128) * 128
        if self.di is None or ql > self._ql:
            sharded = bool(getattr(self.P, "tpuShardedIndex", 0))
            key = (id(self.gi), ql, sharded, self.P.seedMapMin)
            if key not in self._kernel_cache:
                if sharded:
                    # index row-sharded over the mesh "ix" axis; probe batch
                    # data-parallel over "dp" (parallel/mesh.py)
                    from ..parallel.mesh import (ShardedIndex, make_mesh,
                                                 make_sharded_seed_round)
                    mesh = make_mesh()
                    si = ShardedIndex.build(self.gi, mesh, ql=ql)
                    self._kernel_cache[key] = (si, make_sharded_seed_round(si),
                                               False)
                else:
                    di = DeviceIndex.build(self.gi, ql=ql)
                    self._kernel_cache[key] = (di, make_seed_round(di), True)
            self.di, self.seed_round, self.seed_round_budgeted = \
                self._kernel_cache[key]
            self._ql = ql

    # -------------------------------------------------------------- batching
    def align_stream(self, reader, stats) -> Iterator[ReadResult]:
        batch = []
        n = 0
        for item in reader:
            if self.P.readMapNumber >= 0 and n >= self.P.readMapNumber:
                break
            batch.append(item)
            n += 1
            if len(batch) >= self.batch_size:
                yield from self._align_batch(batch, stats)
                batch = []
        if batch:
            yield from self._align_batch(batch, stats)

    def _align_batch(self, batch, stats) -> Iterator[ReadResult]:
        P = self.P
        with _tick("prepare"):
            prepped = []
            for name, seqs, quals, ftype in batch:
                res, reads = self.host.prepare_read(name, seqs, quals)
                res.read_file_type = ftype
                prepped.append((res, reads))
        lmax = max(r.lread for r, _ in prepped)
        self._ensure_kernel(lmax)

        # read matrix [R, lmax] padded with -1
        R = len(prepped)
        read_mat = np.full((R, lmax), -1, dtype=np.int8)
        for i, (res, reads) in enumerate(prepped):
            read_mat[i, :res.lread] = reads[0]

        # ---- flat chain descriptors (reference seed-loop structure)
        c_read, c_pstart, c_plen, c_dir, c_istl, c_ifrag, c_piece = \
            [], [], [], [], [], [], []
        per_read_pieces = []
        for i, (res, reads) in enumerate(prepped):
            pieces, lgood = quality_split(reads[0], res.lread, P.maxNsplit,
                                          P.seedSplitMin)
            per_read_pieces.append((pieces, lgood))
            ssl = min(P.seedSearchStartLmax,
                      int(P.seedSearchStartLmaxOverLread * (res.lread - 1)))
            for ip, (p_start, p_len, ifrag) in enumerate(pieces):
                n_start = p_len // ssl + 1 \
                    if (P.seedSearchStartLmax > 0 and ssl < p_len) else 1
                l_start = p_len // n_start
                for i_dir in range(2):
                    for istart in range(n_start):
                        c_read.append(i)
                        c_pstart.append(p_start)
                        c_plen.append(p_len)
                        c_dir.append(i_dir)
                        c_istl.append(istart * l_start)
                        c_ifrag.append(ifrag)
                        c_piece.append(ip)

        NC = len(c_read)
        probes = None
        if NC:
            with _tick("seed_loop"):
                cargs = (np.asarray(c_read, np.int32),
                         np.asarray(c_pstart, np.int32),
                         np.asarray(c_plen, np.int32),
                         np.asarray(c_dir, np.int32),
                         np.asarray(c_istl, np.int32))
                probes = self._run_chains_fused(read_mat, *cargs)
                if probes is None:
                    probes = self._run_chains(read_mat, *cargs)

        with _tick("replay"):
            seeds_by_read, seed_flat = _replay_store_aligns(
                P, R,
                np.asarray(c_read, np.int32), np.asarray(c_pstart, np.int32),
                np.asarray(c_plen, np.int32), np.asarray(c_dir, np.int32),
                np.asarray(c_istl, np.int32), np.asarray(c_ifrag, np.int32),
                np.asarray(c_piece, np.int32), probes)

        # ---- batched windows + stitch + extend (ops/batch_engine.py);
        # per-read host fallback for shapes outside the static envelope
        from . import batch_engine as be
        results = {}
        fb = np.ones(R, bool)
        fast_fin = False
        if be.fast_path_config_ok(self.gi, P) and len(seed_flat.read):
            fast_fin = be.fast_finish_config_ok(P)
            lread = np.asarray([r.lread for r, _ in prepped], np.int64)
            read_len2 = np.asarray([r.read_length[:2] for r, _ in prepped],
                                   np.int64)
            nmm_max = np.minimum(
                P.outFilterMismatchNmax,
                (P.outFilterMismatchNoverReadLmax
                 * (read_len2[:, 0] + read_len2[:, 1])).astype(np.int64))
            fwd = read_mat.astype(np.uint8)      # -1 pad -> 255 (PAD_BASE)
            k = np.arange(lmax)
            src = np.clip(lread[:, None] - 1 - k[None, :], 0, lmax - 1)
            rcv = np.take_along_axis(read_mat, src, axis=1)
            rc = np.where(k[None, :] < lread[:, None],
                          np.where(rcv < 4, 3 - rcv, rcv), -1).astype(np.uint8)
            dump_dir = _os.environ.get("STAR_TPU_DUMP_STITCH")
            if dump_dir:
                _os.makedirs(dump_dir, exist_ok=True)
                import pickle
                nb = len(_os.listdir(dump_dir))
                with open(f"{dump_dir}/batch_{nb:04d}.pkl", "wb") as f:
                    pickle.dump(dict(seeds=seed_flat, fwd=fwd, rc=rc,
                                     lread=lread, read_len2=read_len2,
                                     nmm_max=nmm_max), f)
            with _tick("stitch_batch"):
                fb, results = be.stitch_batch(self.gi, P, seed_flat, fwd, rc,
                                              lread, read_len2, nmm_max,
                                              lazy=fast_fin)

        with _tick("finish"):
            outs = []
            for i, (res, reads) in enumerate(prepped):
                pieces, lgood = per_read_pieces[i]
                seeds = seeds_by_read[i]
                seeds.max_good_piece = lgood
                seeds.n_split = len(pieces)
                pre = results.get(i) if not fb[i] else None
                if pre is None and hasattr(seeds, "_fill_pc"):
                    seeds._fill_pc(i)
                if pre is not None and fast_fin:
                    out = _fast_finish(self.host, res, seeds, pre,
                                       P, self.gi)
                else:
                    out = self.host.finish_read(res, reads, seeds,
                                                precomputed=pre)
                stats.add_read(out)
                outs.append(out)
        yield from outs

    # fixed lane buckets: compiles happen once per shape and the
    # persistent cache stays hot
    # bucket cap: the pallas fetch kernels keep their per-lane offset arrays
    # in SMEM (1 MB); 128K-lane shapes blow it (compile OOM on v5e)
    LANE_BUCKETS = (2048, 16384, 32768)

    # lockstep loops pay for the slowest lane: cap iterations at a budget
    # that covers the typical SAi-narrowed bisection, then re-dispatch just
    # the unconverged lanes (absent prefixes bisecting huge intervals) with
    # a budget covering log2(nSA) fully
    PRIMARY_BUDGET = 12
    RESPIN_BUDGET = 72

    def _bucket(self, n):
        return next((b for b in self.LANE_BUCKETS if n <= b),
                    ((n + self.LANE_BUCKETS[-1] - 1)
                     // self.LANE_BUCKETS[-1]) * self.LANE_BUCKETS[-1])

    def warm_buckets(self, max_read_len: int = 100):
        """compile every lane-bucket shape up front (remote compiles cost
        minutes; an unwarmed shape would land inside a timed run)"""
        self._ensure_kernel(max_read_len)
        if not self.seed_round_budgeted:
            return
        rm = jax.device_put(np.full((self.batch_size, self._ql), -1, np.int8))
        for b in self.LANE_BUCKETS:
            z = np.zeros(b, np.int32)
            self._dispatch(rm, z, z, z, z, b, budget=self.PRIMARY_BUDGET)

    def _dispatch(self, rm_dev, c_read, start, c_dir, slen, n,
                  budget=RESPIN_BUDGET):
        """pad one compacted round to a lane bucket and run it; internally
        re-dispatches budget-unconverged lanes so results are always final"""
        lanes = self._bucket(n)
        pad = lambda a, fill=0: np.concatenate(
            [a, np.full(lanes - n, fill, a.dtype)]) if lanes != n else a
        out = self.seed_round(rm_dev, pad(c_read), pad(start), pad(c_dir),
                              pad(slen),
                              pad(np.ones(n, bool), False), budget)
        # one full-bucket D2H per output (host-side slice; a device-side
        # x[:n] would dispatch a tiny remote op per call), then copy so the
        # respin merge below can write into it
        res = [np.asarray(x)[:n].copy() for x in out]
        unc = res[4]
        if unc.any() and budget < self.RESPIN_BUDGET:
            ui = np.nonzero(unc)[0]
            r2 = self._dispatch(rm_dev, c_read[ui], start[ui], c_dir[ui],
                                slen[ui], len(ui), budget=self.RESPIN_BUDGET)
            for a, b in zip(res[:4], r2[:4]):
                a[ui] = b
        return res[:4]

    def _dispatch_sharded(self, cv, offs, slen, n):
        lanes = self._bucket(n)
        QL = cv.shape[1]
        cvp = np.full((lanes, QL), -1, dtype=np.int8)
        cvp[:n] = cv
        op = np.zeros(lanes, dtype=np.int32)
        op[:n] = offs
        sp = np.zeros(lanes, dtype=np.int32)
        sp[:n] = slen
        val = np.zeros(lanes, dtype=bool)
        val[:n] = True
        out = self.seed_round(cvp, op, sp, val)
        return [np.asarray(x)[:n] for x in out]

    _fused_cache = {}

    def _run_chains_fused(self, read_mat, c_read, c_pstart, c_plen, c_dir,
                          c_istl):
        """single-dispatch seed loop (make_fused_seed_fn); returns the same
        probe arrays as _run_chains or None when unavailable/overflowed"""
        if _os.environ.get("STAR_TPU_FUSED_SEED", "1") == "0" \
                or not self.seed_round_budgeted:
            return None
        NC = len(c_read)
        D = int(getattr(self.gi, "sa_sparse_d", 1)) or 1
        NCb = 1 << max(12, (NC - 1).bit_length())
        QL = self._ql
        Rp = max(self.batch_size, read_mat.shape[0])
        rmp = np.full((Rp, QL), -1, np.int8)
        rmp[:read_mat.shape[0], :read_mat.shape[1]] = read_mat
        rm_dev = jax.device_put(rmp)
        pad = lambda a: np.concatenate(
            [a, np.zeros(NCb - NC, a.dtype)]) if NCb != NC else a
        args = [pad(np.asarray(x, np.int32)) for x in
                (c_read, c_pstart, c_plen, c_dir, c_istl)]
        valid0 = np.zeros(NCb, bool)
        valid0[:NC] = True
        di = self.di
        OCAP = NCb * D * 8
        for _attempt in range(2):
            key = (id(di), NCb, OCAP, D, QL)
            eng = self._fused_cache.get(key)
            if eng is None:
                eng = make_fused_seed_fn(di, D, NCb, OCAP)
                self._fused_cache[key] = eng
            out, n_out, nprobes, mbest_acc, ovf = eng(
                di.t2f, di.saf, di.saif, rm_dev, *[jax.device_put(a)
                                                   for a in args],
                jax.device_put(valid0), jnp.int32(self.P.seedMapMin))
            if int(ovf) == 0:
                break
            OCAP *= 8
        else:
            return None
        if int(ovf) != 0:
            return None
        n_o = int(n_out)
        n_ob = min(((max(n_o, 1) + 8191) // 8192) * 8192, OCAP)
        rows = np.asarray(out[:n_ob])[:n_o]
        nprobes = np.asarray(nprobes)[:NC]
        np_max = int(nprobes.max()) if NC else 0
        mbest = np.zeros((NC, MAXP), np.int32)
        if np_max:
            npm_b = min(((np_max + 7) // 8) * 8, MAXP)
            mbest[:, :np_max] = np.asarray(
                mbest_acc[:, :npm_b])[:NC, :np_max]
        oml = np.zeros((NC, MAXP, D), np.int32)
        onr = np.zeros_like(oml)
        olo = np.zeros_like(oml)
        ohi = np.zeros_like(oml)
        if n_o:
            ci, ki, di_ = rows[:, 0], rows[:, 1], rows[:, 2]
            keep = ci < NC
            ci, ki, di_ = ci[keep], ki[keep], di_[keep]
            oml[ci, ki, di_] = rows[keep, 3]
            onr[ci, ki, di_] = rows[keep, 4]
            olo[ci, ki, di_] = rows[keep, 5]
            ohi[ci, ki, di_] = rows[keep, 6]
        return oml, onr, olo, ohi, mbest, nprobes

    def _run_chains(self, read_mat, c_read, c_pstart, c_plen, c_dir, c_istl):
        """the reference's per-read seed loop (ReadAlign_mapOneRead.cpp:65-78)
        as batched device rounds with host-side chain compaction: each round
        dispatches only the chains still alive (actives collapse ~3x/round).
        The read matrix is uploaded once per batch; rounds ship only int32
        descriptors per lane (the host->device link is the bottleneck).

        Sparse suffix arrays (--genomeSAsparseD > 1): every round probes D
        phase offsets per chain (reference
        ReadAlign_maxMappableLength2strands.cpp:18-113); the chain advances
        by the best maxL + offset, and all offset-winning probes are stored.
        Returns (oml, onr, olo, ohi [NC, MAXP, D], max_best [NC, MAXP],
        nprobes [NC])."""
        NC = len(c_read)
        QL = self._ql
        P = self.P
        fast = self.seed_round_budgeted
        D = int(getattr(self.gi, "sa_sparse_d", 1)) if fast else 1
        if fast:
            # pad the read count to the batch-size bucket: the jitted round is
            # shape-keyed on the read matrix, and a partial final batch must
            # NOT trigger a fresh (minutes-long) remote compile
            Rp = max(self.batch_size, read_mat.shape[0])
            rmp = np.full((Rp, QL), -1, np.int8)
            rmp[:read_mat.shape[0], :read_mat.shape[1]] = read_mat
            rm_dev = jax.device_put(rmp)
        else:
            shift0 = np.where(c_dir == 0, c_pstart, c_pstart + c_plen - 1)
            chainview = _build_queries(read_mat, c_read, shift0, c_plen,
                                       c_dir, QL)

        l_mapped = np.zeros(NC, dtype=np.int32)
        active = c_istl + P.seedMapMin < c_plen
        oml = np.zeros((NC, MAXP, D), dtype=np.int32)
        onr = np.zeros((NC, MAXP, D), dtype=np.int32)
        olo = np.zeros((NC, MAXP, D), dtype=np.int32)
        ohi = np.zeros((NC, MAXP, D), dtype=np.int32)
        mbest = np.zeros((NC, MAXP), dtype=np.int32)
        nprobes = np.zeros(NC, dtype=np.int32)
        dists = np.arange(D, dtype=np.int32)

        for k in range(MAXP):
            idx = np.nonzero(active)[0]
            if len(idx) == 0:
                break
            offs = c_istl[idx] + l_mapped[idx]
            slen = c_plen[idx] - l_mapped[idx] - c_istl[idx]
            A = len(idx)
            # expand to A*D probe lanes (chain-major, offset-minor)
            idx_e = np.repeat(idx, D)
            offs_e = np.repeat(offs, D)
            slen_e = np.repeat(slen, D) - np.tile(dists, A)
            dist_e = np.tile(dists, A)
            maxl = np.empty(A * D, dtype=np.int32)
            nrep = np.empty_like(maxl)
            lo = np.empty_like(maxl)
            hi = np.empty_like(maxl)
            W = self.LANE_BUCKETS[-1]
            for w0 in range(0, A * D, W):
                w1 = min(w0 + W, A * D)
                sl = idx_e[w0:w1]
                if fast:
                    adv = offs_e[w0:w1] + dist_e[w0:w1]
                    start = np.where(
                        c_dir[sl] == 0, c_pstart[sl] + adv,
                        c_pstart[sl] + c_plen[sl] - 1 - adv).astype(np.int32)
                    r = self._dispatch(rm_dev, c_read[sl], start,
                                       c_dir[sl].astype(np.int32),
                                       slen_e[w0:w1], w1 - w0,
                                       budget=self.PRIMARY_BUDGET)
                else:
                    r = self._dispatch_sharded(chainview[sl], offs_e[w0:w1],
                                               slen_e[w0:w1], w1 - w0)
                maxl[w0:w1], nrep[w0:w1], lo[w0:w1], hi[w0:w1] = r
            maxl = maxl.reshape(A, D)
            val = dists[None, :] < slen[:, None]
            maxl = np.where(val, maxl, 0)
            mb = np.where(val, maxl + dists[None, :],
                          -1).max(axis=1).astype(np.int32)
            oml[idx, k] = maxl
            onr[idx, k] = nrep.reshape(A, D)
            olo[idx, k] = lo.reshape(A, D)
            ohi[idx, k] = hi.reshape(A, D)
            mbest[idx, k] = mb
            nprobes[idx] += 1
            l_mapped[idx] += mb
            active[idx] = (mb > 0) & \
                (c_istl[idx] + l_mapped[idx] + P.seedMapMin < c_plen[idx])
        return oml, onr, olo, ohi, mbest, nprobes


def _fast_finish(host, res, seeds, pre, P, gi):
    """array-native finish_read for batched reads (fast_finish_config_ok):
    multMapSelect + mappedFilter over _LaneTr proxies; Transcript objects are
    materialized only for the alignments the output consumes (reference:
    ReadAlign_multMapSelect.cpp:8-95, ReadAlign_mappedFilter.cpp:3-21)."""
    from ..align.transcript import Transcript
    from ..constants import (MARKER_NO_GOOD_PIECES, MARKER_NO_GOOD_WINDOW,
                             MARKER_READ_TOO_SHORT,
                             MARKER_ALL_PIECES_EXCEED_seedMultimapNmax,
                             UNMAP_TOO_SHORT, UNMAP_TOO_MANY_MM,
                             UNMAP_MULTIMAP)
    lread = res.lread
    tr_init = Transcript()
    tr_init.Lread = lread
    res.tr_best = tr_init
    if lread < P.outFilterMatchNmin:
        res.map_marker = MARKER_READ_TOO_SHORT
        host._finish_unmapped(res)
        return res
    if seeds.n_split == 0:
        res.map_marker = MARKER_NO_GOOD_PIECES
        host._finish_unmapped(res)
        return res
    if seeds.nA == 0:
        res.map_marker = MARKER_ALL_PIECES_EXCEED_seedMultimapNmax
        host._finish_unmapped(res)
        return res

    win_list, msm = pre[0], pre[1]
    over = len(pre) > 2 and pre[2]
    tb = None
    for win in win_list:
        w0 = win[0]
        if tb is None or w0.maxScore > tb.maxScore \
                or (w0.maxScore == tb.maxScore and w0.gLength < tb.gLength):
            tb = w0
    if tb is None or tb.maxScore == 0:
        res.map_marker = MARKER_NO_GOOD_WINDOW
        host._finish_unmapped(res)
        return res

    max_score = tb.maxScore
    rng = P.outFilterMultimapScoreRange
    if over:
        # device-classified too-many-loci read (ops/device_stitch.py
        # select engine): n_tr provably exceeds the cap; its exact value
        # is not consumed anywhere downstream
        prox = []
        n_tr = P.outFilterMultimapNmax + 1
    else:
        prox = []
        for win in win_list:
            for t in win:
                if t.maxScore + rng >= max_score:
                    prox.append(t)
        n_tr = len(prox)
    res.n_tr = n_tr
    res.all_win_tr = []

    if not (n_tr > P.outFilterMultimapNmax or n_tr == 0):
        trs = []
        tb_m = None
        cs = gi.chr_start
        for t in prox:
            o = t.materialize(gi, P)
            o.cStart = o.gStart - cs[o.Chr]
            trs.append(o)
            if t is tb:
                tb_m = o
        res.transcripts = trs
        if n_tr == 1:
            trs[0].primaryFlag = True
        else:
            if P.outMultimapperOrderRandom or P.outSAMmultNmax != -1:
                nbest = 0
                for i in range(len(trs)):
                    if trs[i].maxScore == max_score:
                        trs[i], trs[nbest] = trs[nbest], trs[i]
                        nbest += 1
                trs[0].primaryFlag = True
            elif P.outSAMprimaryFlag == "AllBestScore":
                for tr in trs:
                    if tr.maxScore == max_score:
                        tr.primaryFlag = True
            else:
                tb_m.primaryFlag = True
        res.tr_best = tb_m
    else:
        res.transcripts = []
        res.tr_best = tb.materialize(gi, P)

    mm_max = min(P.outFilterMismatchNmax,
                 int(P.outFilterMismatchNoverReadLmax
                     * (res.read_length[0] + res.read_length[1])))
    if (tb.maxScore < P.outFilterScoreMin
            or tb.maxScore < int(P.outFilterScoreMinOverLread * (lread - 1))
            or tb.nMatch < P.outFilterMatchNmin
            or tb.nMatch < int(P.outFilterMatchNminOverLread * (lread - 1))):
        res.unmap_type = UNMAP_TOO_SHORT
    elif (tb.nMM > mm_max
          or (tb.mappedLength > 0
              and tb.nMM / tb.mappedLength > P.outFilterMismatchNoverLmax)):
        res.unmap_type = UNMAP_TOO_MANY_MM
    elif n_tr > P.outFilterMultimapNmax:
        res.unmap_type = UNMAP_MULTIMAP
    else:
        res.unmap_type = -1
    return res


def _empty_seed_arrays():
    from .batch_engine import SeedArrays
    z64 = np.zeros(0, np.int64)
    return SeedArrays(read=np.zeros(0, np.int32), r_start=z64, length=z64,
                      idir=np.zeros(0, np.int8), nrep=z64, lo=z64, hi=z64,
                      ifrag=np.zeros(0, np.int8))


def _replay_store_aligns(P, n_reads, c_read, c_pstart, c_plen, c_dir,
                         c_istl, c_ifrag, c_piece, probes):
    """vectorized replay of the reference's storeAligns bookkeeping
    (reference: ReadAlign_storeAligns.cpp): builds each read's sorted piece
    table from the device probe arrays, preserving reference insertion
    order, dedup and multimap accounting."""
    seeds = [SeedResult(pc=[], nA=0, nUM=(0, 0), mult_nmin=0,
                        mult_nmin_l=0, max_good_piece=0, n_split=0)
             for _ in range(n_reads)]
    if probes is None:
        return seeds, _empty_seed_arrays()
    oml, onr, olo, ohi, mbest, nprobes = probes
    NC = len(c_read)
    if NC == 0:
        return seeds, _empty_seed_arrays()

    # flatten probes chain-major, chronological within chain
    np_max = int(nprobes.max()) if NC else 0
    if np_max == 0:
        return seeds, _empty_seed_arrays()
    k = np.arange(np_max)
    keep = k[None, :] < nprobes[:, None]              # [NC, np_max]
    ci, ki = np.nonzero(keep)
    # chain advance per round is the best (maxL + offset); lm_before gives
    # each round's start within the piece
    lm_before = np.zeros_like(mbest[:, :np_max])
    lm_before[:, 1:] = np.cumsum(mbest[:, :np_max - 1], axis=1)
    # sparse phase offsets: every offset-winning probe of a round is stored
    # (reference maxMappableLength2strands.cpp:18-113); offsets past the
    # remaining seed length were never probed
    D = oml.shape[2]
    dists = np.arange(D, dtype=np.int64)
    slen_r = c_plen[ci] - c_istl[ci] - lm_before[ci, ki]
    win = (dists[None, :] < slen_r[:, None]) \
        & (oml[ci, ki] + dists[None, :] == mbest[ci, ki][:, None])
    pi, di_ = np.nonzero(win)     # round-major, offset-minor (storeAligns order)
    ci = ci[pi]
    ki = ki[pi]
    maxl = oml[ci, ki, di_]
    nrep = onr[ci, ki, di_]
    lo = olo[ci, ki, di_]
    hi = ohi[ci, ki, di_]
    adv = c_istl[ci] + lm_before[ci, ki] + di_
    shift = np.where(c_dir[ci] == 0,
                     c_pstart[ci] + adv,
                     c_pstart[ci] + c_plen[ci] - 1 - adv)

    # reference skip rule: if the piece's (dir0, istart0) chain mapped the
    # whole piece in its first probe, the (dir1, istart0) chain is skipped.
    # The reference compares Shift+L (absolute read position, including the
    # piece start) against the piece LENGTH (ReadAlign_mapOneRead.cpp:74) —
    # so for N-split pieces with p_start>0 the skip almost never fires;
    # replicate that quirk exactly.
    is_d0i0 = (c_dir == 0) & (c_istl == 0)
    first_full = np.zeros(NC, dtype=bool)
    first_full[is_d0i0] = (nprobes[is_d0i0] > 0) & \
        (c_pstart[is_d0i0] + mbest[is_d0i0, 0] == c_plen[is_d0i0])
    piece_key = c_read.astype(np.int64) * (c_piece.max() + 1) + c_piece
    full_by_piece = {}
    for c in np.nonzero(is_d0i0 & first_full)[0]:
        full_by_piece[piece_key[c]] = True
    skip_chain = np.zeros(NC, dtype=bool)
    is_d1i0 = (c_dir == 1) & (c_istl == 0)
    for c in np.nonzero(is_d1i0)[0]:
        if full_by_piece.get(piece_key[c]):
            skip_chain[c] = True
    kept = ~skip_chain[ci]
    ci, maxl, nrep, lo, hi, shift = \
        ci[kept], maxl[kept], nrep[kept], lo[kept], hi[kept], shift[kept]

    read = c_read[ci]
    idir = c_dir[ci]
    ifrag = c_ifrag[ci]

    # multimap cap: dropped probes only update (mult_nmin, mult_nmin_l)
    over = nrep > P.seedMultimapNmax
    if over.any():
        ro, no, lo_ = read[over], nrep[over], maxl[over]
        order = np.lexsort((np.arange(len(ro)), no, ro))
        ro_s, no_s, l_s = ro[order], no[order], lo_[order]
        firsts = np.ones(len(ro_s), dtype=bool)
        firsts[1:] = ro_s[1:] != ro_s[:-1]
        for r, n_, l_ in zip(ro_s[firsts], no_s[firsts], l_s[firsts]):
            seeds[r].mult_nmin = int(n_)
            seeds[r].mult_nmin_l = int(l_)
    read, idir, ifrag, maxl, nrep, lo, hi, shift = [
        a[~over] for a in (read, idir, ifrag, maxl, nrep, lo, hi, shift)]

    # accounting (reference nUM / nA counters)
    uniq = nrep == 1
    add0 = np.bincount(read[uniq], weights=nrep[uniq], minlength=n_reads)
    add1 = np.bincount(read[~uniq], weights=nrep[~uniq], minlength=n_reads)
    addA = np.bincount(read, weights=nrep, minlength=n_reads)
    for r in range(n_reads):
        seeds[r].nUM = (int(add0[r]), int(add1[r]))
        seeds[r].nA = int(addA[r])

    # sorted-insert + dedup == stable sort by (rStart asc, Length desc,
    # insertion order) then drop later (rStart, Length) duplicates
    r_start = np.where(idir == 0, shift, shift + 1 - maxl)
    order = np.lexsort((np.arange(len(read)), -maxl, r_start, read))
    rs, ln, rd = r_start[order], maxl[order], read[order]
    dup = np.zeros(len(order), dtype=bool)
    dup[1:] = (rd[1:] == rd[:-1]) & (rs[1:] == rs[:-1]) & (ln[1:] == ln[:-1])
    order = order[~dup]
    counts = np.bincount(read[order], minlength=n_reads)
    if (counts > P.seedPerReadNmax).any():
        raise RuntimeError(
            "too many pieces per read; increase --seedPerReadNmax")
    # pc row lists are only consumed by the per-read host oracle; build them
    # lazily for just the fallback reads (the append loop over every read
    # was ~4% of wall time)
    starts = np.zeros(n_reads + 1, np.int64)
    starts[1:] = np.cumsum(counts)
    pc_rows = np.stack([r_start[order], maxl[order], idir[order],
                        nrep[order], lo[order], hi[order],
                        ifrag[order]], axis=1)

    def fill_pc(i):
        if not seeds[i].pc:
            seeds[i].pc = pc_rows[starts[i]:starts[i + 1]].tolist()

    for r in range(n_reads):
        seeds[r]._fill_pc = fill_pc
    from .batch_engine import SeedArrays
    flat = SeedArrays(
        read=read[order].astype(np.int32),
        r_start=r_start[order].astype(np.int64),
        length=maxl[order].astype(np.int64),
        idir=idir[order].astype(np.int8),
        nrep=nrep[order].astype(np.int64),
        lo=lo[order].astype(np.int64), hi=hi[order].astype(np.int64),
        ifrag=ifrag[order].astype(np.int8))
    return seeds, flat


def _build_queries(read_mat, read_i, shifts, seed_lens, dirs, QL):
    """probe descriptors -> [B, QL] int8 queries padded with -1.
    dir==1 probes read backwards complemented (reference: the reverse-search
    query is complement(read[shift-k]))."""
    B = len(read_i)
    k = np.arange(QL, dtype=np.int32)[None, :]
    sgn = np.where(dirs[:, None] == 0, 1, -1)
    pos = shifts[:, None] + sgn * k
    pos_c = np.clip(pos, 0, read_mat.shape[1] - 1)
    q = read_mat[read_i[:, None], pos_c].astype(np.int8)
    q = np.where(dirs[:, None] == 1, 3 - q, q)
    q = np.where(k < seed_lens[:, None], q, -1).astype(np.int8)
    return q
