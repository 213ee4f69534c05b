"""Fuzz the libstdc++ unordered_map emulation against a real g++ binary.

CellReads.stats byte-identity depends on replicating libstdc++'s hashtable
iteration order (see star_tpu/utils/stdhash.py); this compiles a C++ probe
with the local g++ and compares iteration orders over random insert
sequences, with and without reserve().
"""
import os
import random
import shutil
import subprocess
import sys

import pytest

CPP = r"""
#include <unordered_map>
#include <cstdio>
#include <cstdint>
#include <cstdlib>
int main(int argc, char** argv) {
    std::unordered_map<uint64_t, uint32_t> m;
    long reserve = atol(argv[1]);
    if (reserve > 0) m.reserve(reserve);
    for (int i = 2; i < argc; i++) {
        uint64_t k = strtoull(argv[i], nullptr, 10);
        auto ins = m.insert({k, {}});
        ins.first->second += 1;
    }
    for (auto &kv : m) printf("%llu\n", (unsigned long long)kv.first);
    return 0;
}
"""


@pytest.fixture(scope="module")
def probe(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    d = tmp_path_factory.mktemp("stdhash")
    src = d / "probe.cpp"
    src.write_text(CPP)
    exe = str(d / "probe")
    subprocess.run(["g++", "-O0", "-o", exe, str(src)], check=True)
    return exe


def test_unordered_map_iteration_order(probe):
    from star_tpu.utils.stdhash import UnorderedMap
    rng = random.Random(7)
    for trial in range(40):
        n = rng.randrange(1, 200)
        reserve = rng.choice([0, 0, n // 2, n, 2 * n, 77])
        keys = [rng.randrange(0, rng.choice([50, 1000, 1 << 32])) for _ in range(n)]
        um = UnorderedMap(reserve=reserve)
        for k in keys:
            node = um.find(k)
            if node is None:
                um.insert(k, 1)
        got = [k for k, _ in um.items()]
        res = subprocess.run([probe, str(reserve)] + [str(k) for k in keys],
                             capture_output=True, text=True, check=True)
        want = [int(x) for x in res.stdout.split()]
        assert got == want, f"trial {trial}: reserve={reserve} keys={keys}"
