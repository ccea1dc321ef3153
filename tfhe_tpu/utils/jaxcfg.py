"""JAX configuration helpers."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache.

    The blind-rotation graphs take minutes to compile; caching makes repeat
    runs (tests, benchmarks) start instantly."""
    import jax

    cache_dir = path or os.environ.get(
        "TFHE_TPU_JAX_CACHE", os.path.expanduser("~/.cache/tfhe_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
