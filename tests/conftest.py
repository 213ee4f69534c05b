import os

# Force a virtual 8-device CPU mesh for sharding tests before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

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
