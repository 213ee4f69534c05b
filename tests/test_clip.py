"""Read clipping vs reference goldens: fixed 5p/3p clips + Hamming 3p
adapter (localSearch) and CellRanger4 TSO/polyA (opal OV-mode SW replica)."""
import os

import pytest

from tests.conftest import DATA, GOLD


def _strip_header(path):
    with open(path) as f:
        return [l for l in f if not l.startswith("@")]


@pytest.mark.parametrize("name,extra", [
    ("ham_", ["--clip3pAdapterSeq", "AGATCGGAAGAGC", "--clip5pNbases", "3",
              "--clip3pNbases", "2", "--clip3pAfterAdapterNbases", "1"]),
    ("cr4_", ["--clipAdapterType", "CellRanger4"]),
])
def test_clip_golden(tmp_path, name, extra, use_device):
    from star_tpu.params import Parameters
    from star_tpu.run import align_reads
    prefix = str(tmp_path) + "/" + name
    P = Parameters(["--genomeDir", os.path.join(GOLD, "genome_idx"),
                    "--readFilesIn", os.path.join(DATA, "reads_clip.fastq"),
                    "--outFileNamePrefix", prefix,
                    "--outSAMunmapped", "Within"] + extra)
    align_reads(P, use_device=use_device)
    for f in ["Aligned.out.sam", "SJ.out.tab"]:
        got = _strip_header(prefix + f)
        want = _strip_header(os.path.join(GOLD, "clip", name + f))
        assert got == want, f


def test_opal_ov_brute_force():
    """opal OV-mode DP vs brute-force alignment enumeration on tiny cases"""
    import itertools
    import random
    from star_tpu.align.clip import opal_ov_score_end, _CR4_SCORE

    def brute(query, target):
        # best overlap alignment score: free leading/trailing gaps both sides
        nq, nt = len(query), len(target)
        best = None
        # H[i][j] via simple recursion replicated independently
        import functools
        NEG = -10**9
        H = [[0] * (nt + 1) for _ in range(nq + 1)]
        for i in range(1, nq + 1):
            for j in range(1, nt + 1):
                H[i][j] = max(H[i - 1][j - 1] + _CR4_SCORE[query[i - 1]][target[j - 1]],
                              H[i - 1][j] - 2, H[i][j - 1] - 2)
        last_row = max(H[nq][1:])
        last_col = max(H[i][nt] for i in range(1, nq + 1))
        return max(last_row, last_col)

    rng = random.Random(5)
    for _ in range(200):
        q = [rng.randrange(4) for _ in range(rng.randrange(2, 8))]
        t = [rng.randrange(5) for _ in range(rng.randrange(2, 12))]
        s, et, eq = opal_ov_score_end(q, t)
        assert s == brute(q, t), (q, t)
