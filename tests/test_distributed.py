"""Multi-host (2-process) runtime: DCN batch sharding over a jax.distributed
CPU cluster (4 virtual devices per process) must be bit-identical to the
single-process oracle, and keyed psum merges must union correctly."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(ROOT, "tests", "golden", "small")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_sharded_mmp(tmp_path, genome_index):
    from star_tpu.align.seed import mmp_search
    gi = genome_index
    # query set (same generator as test_sharding)
    from tests.test_sharding import _make_queries
    qs, qlens = _make_queries(gi, 64, seed=11, ql=128)
    qfile = str(tmp_path / "q.npz")
    np.savez(qfile, qs=qs, qlens=qlens)

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs = []
    outs = []
    for pid in range(2):
        out = str(tmp_path / f"out{pid}.npz")
        outs.append(out)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env.pop("JAX_NUM_PROCESSES", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "star_tpu.parallel.dist", coord, "2",
             str(pid), os.path.join(GOLD, "genome_idx"), qfile, out],
            cwd=ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(o.decode())
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, lg[-3000:]

    z0 = np.load(outs[0])
    z1 = np.load(outs[1])
    got = {k: np.concatenate([z0[k], z1[k]])
           for k in ("maxl", "nrep", "lo", "hi")}
    for b in range(len(qs)):
        assert (int(got["maxl"][b]), int(got["nrep"][b]), int(got["lo"][b]),
                int(got["hi"][b])) == mmp_search(gi, qs[b, :qlens[b]]), b

    # keyed merge: both processes computed identical replicated totals that
    # equal the host union merge
    assert (z0["all_keys"] == z1["all_keys"]).all()
    assert (z0["merged"] == z1["merged"]).all()
    want = {}
    for z in (z0, z1):
        for k, c in zip(z["keys"], z["cnts"]):
            want[int(k)] = want.get(int(k), np.zeros(2, np.int64)) + c
    keys_sorted = sorted(want)
    assert list(z0["all_keys"]) == keys_sorted
    for i, k in enumerate(keys_sorted):
        assert (z0["merged"][i] == want[k]).all(), (i, k)
