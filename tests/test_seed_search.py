"""MMP seed-search property tests: binary-search result must equal a
brute-force scan of the whole suffix array."""
import numpy as np
import pytest

from star_tpu.align.seed import mmp_search, sai_lookup


def _brute_force(gi, Q):
    """max lcp over all suffixes + the full interval achieving it."""
    t2 = np.concatenate([gi.t2, np.full(len(Q), 5, dtype=np.int8)])
    n = len(gi.sa)
    best = 0
    rows = []
    # compute lcp per row (vectorised)
    idx = gi.sa[:, None] + np.arange(len(Q))[None, :]
    chars = t2[np.minimum(idx, len(t2) - 1)]
    eq = chars == Q[None, :]
    lcp = np.where(eq.all(axis=1), len(Q), np.argmin(eq, axis=1))
    best = int(lcp.max())
    rows = np.flatnonzero(lcp == best)
    return best, rows[0], rows[-1]


@pytest.mark.parametrize("seed", range(5))
def test_mmp_matches_brute_force(genome_index, seed):
    gi = genome_index
    rng = np.random.default_rng(seed)
    for trial in range(40):
        if trial % 2 == 0:
            # genomic substring (long exact hit) with occasional mutation
            p = int(rng.integers(0, gi.n_genome - 200))
            Q = gi.G[p:p + int(rng.integers(8, 60))].copy()
            if (Q >= 4).any():
                continue
            if trial % 4 == 0 and len(Q) > 10:
                Q[int(rng.integers(2, len(Q) - 2))] = int(rng.integers(0, 4))
        else:
            Q = rng.integers(0, 4, size=int(rng.integers(8, 40))).astype(np.int8)
        maxL, nrep, lo, hi = mmp_search(gi, Q)
        bL, blo, bhi = _brute_force(gi, Q)
        assert maxL == bL, (trial, Q.tolist())
        assert (lo, hi) == (blo, bhi), (trial, maxL, Q.tolist())
        assert nrep == hi - lo + 1


def test_sai_lookup_short_query(genome_index):
    gi = genome_index
    rng = np.random.default_rng(0)
    for _ in range(50):
        Q = rng.integers(0, 4, size=6).astype(np.int8)
        maxL, nrep, lo, hi = mmp_search(gi, Q)
        bL, blo, bhi = _brute_force(gi, Q)
        # short queries resolved purely from the prefix index must agree
        assert maxL == bL and (lo, hi) == (blo, bhi)
