"""JAX configuration helpers."""

from __future__ import annotations

import os


def _host_tag() -> str:
    """Fingerprint of the host CPU for the XLA:CPU cache namespace.

    XLA:CPU AOT artifacts bake in the compile machine's feature set
    (avx512*, amx, prefer-no-gather, ...); loading them on a different host
    warns 'could lead to execution errors such as SIGILL'. TPU executables
    are host-independent, but CPU runs (tests, the driver's multichip
    dryrun) must not share one directory across heterogeneous workers — so
    CPU caches go in a per-feature-set subdirectory."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":")[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return platform.machine()


def enable_compile_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache.

    The blind-rotation graphs take minutes to compile; caching makes repeat
    runs (tests, benchmarks) start instantly."""
    import jax

    cache_dir = path or os.environ.get(
        "TFHE_TPU_JAX_CACHE", os.path.expanduser("~/.cache/tfhe_tpu_jax"))
    # decide CPU-ness from the *configured* platform only — initializing the
    # backend here (jax.default_backend()) would block forever if the remote
    # TPU worker is down
    platforms = (getattr(jax.config, "jax_platforms", None)
                 or os.environ.get("JAX_PLATFORMS", ""))
    if platforms and platforms.split(",")[0] == "cpu":
        cache_dir = os.path.join(cache_dir, f"cpu-{_host_tag()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
