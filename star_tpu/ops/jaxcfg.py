"""JAX runtime configuration for the device path.

The remote-compile TPU environment makes every new (shape, program) pair
expensive, so: (1) persist compiled executables across processes, and
(2) quantise batch shapes into a few buckets (see pipeline.py) so the same
executables are reused.
"""
import os

_done = False


def setup_jax_cache():
    global _done
    if _done:
        return
    import jax
    cache_dir = os.environ.get("STAR_TPU_JAX_CACHE", "/tmp/star_tpu_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    _done = True
