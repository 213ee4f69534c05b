"""Device (jnp/jit) stitch engine vs goldens — forced on regardless of the
batch-size heuristic, so the engine in ops/device_stitch.py stays covered by
the byte-identical golden suite even for tiny test batches.

The engine is exercised on the CPU backend here (conftest pins
JAX_PLATFORMS=cpu); the algorithm is backend-independent jnp, and the
bench/driver runs exercise the same code on the real chip."""
import os

import pytest

from tests.conftest import DATA, GOLD
from tests.test_golden_align import _run_align, _strip_header


@pytest.fixture()
def force_device_stitch(monkeypatch):
    monkeypatch.setenv("STAR_TPU_DEVICE_STITCH", "1")
    monkeypatch.setenv("STAR_TPU_DEVICE_STITCH_MIN", "0")
    monkeypatch.setenv("STAR_TPU_DEV_CLASSIFY_MIN", "0")


@pytest.mark.parametrize("case,reads", [
    ("se", ["reads_se.fastq"]),
    ("pe", ["reads_pe_1.fastq", "reads_pe_2.fastq"]),
])
def test_device_stitch_golden(tmp_path, case, reads, force_device_stitch):
    prefix = _run_align(tmp_path, os.path.join(GOLD, "genome_idx"),
                        [os.path.join(DATA, r) for r in reads],
                        use_device=True)
    got = _strip_header(prefix + "Aligned.out.sam")
    want = _strip_header(os.path.join(GOLD, case, "Aligned.out.sam"))
    assert got == want
    with open(prefix + "SJ.out.tab") as f1, \
         open(os.path.join(GOLD, case, "SJ.out.tab")) as f2:
        assert f1.read() == f2.read()


def test_device_stitch_gtf_golden(tmp_path, force_device_stitch):
    """sjdb path (annotated junctions) through the device engine"""
    prefix = _run_align(tmp_path, os.path.join(GOLD, "genome_idx_gtf"),
                        [os.path.join(DATA, "reads_se.fastq")],
                        use_device=True)
    want_dir = os.path.join(GOLD, "se_gtf")
    if not os.path.isdir(want_dir):
        pytest.skip("no se_gtf golden")
    got = _strip_header(prefix + "Aligned.out.sam")
    want = _strip_header(os.path.join(want_dir, "Aligned.out.sam"))
    assert got == want
