"""Shared JAX configuration: persistent compilation cache.

First TPU compiles of the fingerprint/search programs take tens of seconds;
the persistent cache makes subsequent processes (CLI runs, benchmarks) start
hot. Import this module before any jitted call.
"""

import os

import jax

_initialized = False


def ensure() -> None:
    global _initialized
    if _initialized:
        return
    _initialized = True
    cache_dir = os.environ.get(
        "NEEDLE_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "needle_tpu_jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
