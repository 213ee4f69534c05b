"""Device-accelerated alignment pipeline.

Reads are processed in large batches.  The MMP seed search — the hot loop —
runs on device: every read contributes a set of probe *chains* (piece x
direction x staggered start, reference: ReadAlign_mapOneRead.cpp), each round
dispatches one probe per active chain through the batched SA-search kernel
(ops/sa_search.py), and the per-chain results are replayed into the piece
table in the reference's chronological order so the downstream window/stitch
stages see identical input.  Windows/stitching/output currently run on host;
they migrate to device DP kernels stage by stage.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List

import numpy as np

from ..align.engine import ReadAligner, ReadResult
from ..align.seed import SeedResult, quality_split, store_align
from .jaxcfg import setup_jax_cache
from .sa_search import DeviceIndex, make_mmp_kernel


@dataclass
class _Chain:
    read_i: int
    piece_start: int
    piece_len: int
    i_dir: int
    istart: int
    l_start: int
    ifrag: int
    l_mapped: int = 0
    active: bool = True
    probes: list = None  # [(shift, seed_len, maxL, nrep, lo, hi)]

    def __post_init__(self):
        if self.probes is None:
            self.probes = []


class DeviceAligner:
    def __init__(self, gi, P, batch_size: int = None):
        self.gi = gi
        self.P = P
        self.batch_size = batch_size or P.tpuBatchSize
        self.host = ReadAligner(gi, P)
        self.di = None
        self.kernel = None
        self._ql = None

    def _ensure_kernel(self, max_read_len: int):
        setup_jax_cache()
        ql = ((max_read_len + 2 + 127) // 128) * 128
        if self.di is None or ql > self._ql:
            self.di = DeviceIndex.build(self.gi, ql=ql)
            self.kernel = make_mmp_kernel(self.di)
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
        P, gi = self.P, self.gi
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

        # build chains (reference seed-loop structure)
        chains: List[_Chain] = []
        per_read_seeds: List[SeedResult] = []
        per_read_chains: List[list] = []
        for i, (res, reads) in enumerate(prepped):
            seeds = SeedResult(pc=[], nA=0, nUM=(0, 0), mult_nmin=0,
                               mult_nmin_l=0, max_good_piece=0, n_split=0)
            pieces, lgood = quality_split(reads[0], res.lread, P.maxNsplit, P.seedSplitMin)
            seeds.max_good_piece = lgood
            seeds.n_split = len(pieces)
            per_read_seeds.append(seeds)
            rchains = []
            ssl = min(P.seedSearchStartLmax,
                      int(P.seedSearchStartLmaxOverLread * (res.lread - 1)))
            for (p_start, p_len, ifrag) in pieces:
                n_start = p_len // ssl + 1 if (P.seedSearchStartLmax > 0 and ssl < p_len) else 1
                l_start = p_len // n_start
                for i_dir in range(2):
                    for istart in range(n_start):
                        c = _Chain(i, p_start, p_len, i_dir, istart, l_start, ifrag)
                        if istart * l_start + P.seedMapMin >= p_len:
                            c.active = False
                        chains.append(c)
                        rchains.append(c)
            per_read_chains.append(rchains)

        # probe rounds
        NC = len(chains)
        if NC:
            self._run_chain_rounds(chains, read_mat)

        # replay per chain in reference order -> identical piece tables
        for i, rchains in enumerate(per_read_chains):
            seeds = per_read_seeds[i]
            # group by piece: chains were appended piece-major already
            j = 0
            while j < len(rchains):
                piece_chains = [c for c in rchains
                                if (c.piece_start, c.piece_len) ==
                                (rchains[j].piece_start, rchains[j].piece_len)]
                flag_dir_map = True
                for c in piece_chains:
                    if c.i_dir == 0 and c.istart == 0 and c.probes:
                        shift, seed_len, maxl, _, _, _ = c.probes[0]
                        if shift + maxl == c.piece_len:
                            flag_dir_map = False
                for c in piece_chains:
                    if c.i_dir == 1 and c.istart == 0 and not flag_dir_map:
                        continue
                    for (shift, seed_len, maxl, nrep, lo, hi) in c.probes:
                        store_align(seeds, self.P, c.i_dir, shift, nrep, maxl,
                                    lo, hi, c.ifrag)
                j += len(piece_chains)

        for i, (res, reads) in enumerate(prepped):
            out = self.host.finish_read(res, reads, per_read_seeds[i])
            stats.add_read(out)
            yield out

    def _run_chain_rounds(self, chains: List[_Chain], read_mat: np.ndarray):
        """run all chains to completion; one kernel dispatch per round"""
        P = self.P
        QL = self._ql
        seed_map_min = P.seedMapMin
        # pad dispatches to a fixed lane count so every round (and most
        # batches) reuse one compiled executable; coarse buckets keep the
        # number of distinct compiled shapes tiny (remote compiles are costly)
        lanes = 2048 if len(chains) <= 2048 else ((len(chains) + 8191) // 8192) * 8192
        max_rounds = 64
        for _ in range(max_rounds):
            act = [c for c in chains if c.active]
            if not act:
                break
            B = len(act)
            read_i = np.zeros(lanes, dtype=np.int32)
            shifts = np.zeros(lanes, dtype=np.int32)
            seed_lens = np.full(lanes, 8, dtype=np.int32)
            dirs = np.zeros(lanes, dtype=np.int32)
            read_i[:B] = [c.read_i for c in act]
            dirs[:B] = [c.i_dir for c in act]
            for k, c in enumerate(act):
                if c.i_dir == 0:
                    shifts[k] = c.piece_start + c.istart * c.l_start + c.l_mapped
                else:
                    shifts[k] = c.piece_start + c.piece_len - c.istart * c.l_start - 1 - c.l_mapped
                seed_lens[k] = c.piece_len - c.l_mapped - c.istart * c.l_start

            queries = _build_queries(read_mat, read_i, shifts, seed_lens, dirs, QL)
            maxl, nrep, lo, hi = [np.asarray(x) for x in
                                  self.kernel(queries, seed_lens)]
            for k, c in enumerate(act):
                c.probes.append((int(shifts[k]), int(seed_lens[k]), int(maxl[k]),
                                 int(nrep[k]), int(lo[k]), int(hi[k])))
                c.l_mapped += int(maxl[k])
                if maxl[k] == 0 or (c.istart * c.l_start + c.l_mapped
                                    + seed_map_min >= c.piece_len):
                    c.active = False
        else:
            for c in chains:
                c.active = False


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
