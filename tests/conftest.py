import os

# Force a virtual 8-device CPU mesh for sharding tests.  The environment's
# sitecustomize may pin jax_platforms programmatically, so override both the
# env var and the jax config (before any backend initialisation).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "tests", "data", "small")
GOLD = os.path.join(ROOT, "tests", "golden", "small")


@pytest.fixture(scope="session")
def genome_index():
    from star_tpu.genome.index import GenomeIndex
    return GenomeIndex.load_reference_dir(os.path.join(GOLD, "genome_idx"))


@pytest.fixture(scope="session")
def genome_index_gtf():
    from star_tpu.genome.index import GenomeIndex
    return GenomeIndex.load_reference_dir(os.path.join(GOLD, "genome_idx_gtf"))


@pytest.fixture(params=[False, True], ids=["host", "device"])
def use_device(request):
    """run golden configs through BOTH the host path and the device path
    (VERDICT r1: no golden may exist that only the host path passes)"""
    return request.param
