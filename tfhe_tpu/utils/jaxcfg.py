"""JAX configuration helpers."""

from __future__ import annotations

import os
import re


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


def _stable_platform_version(raw: str) -> str:
    """Strip ephemeral build metadata from a PJRT platform_version string.

    The remote worker's platform_version embeds a build timestamp / CL line
    ("Built on Nov 12 ... cl/831091709") that can differ across worker
    restarts even when the executable format is unchanged; since
    jax._src.cache_key._hash_platform hashes the whole string, every restart
    invalidated the persistent compile cache (three different cache keys for
    byte-identical modules were observed on 2026-08-19 — STATUS.md gap 5).
    Keep only the tokens that actually gate executable compatibility: the
    serialization/compile-cache/compat version tags and the TPU generation.
    """
    keep = []
    for line in raw.replace(";", "\n").splitlines():
        t = line.strip()
        if not t:
            continue
        low = t.lower()
        if low.startswith("built on") or re.search(r"\bcl/\d+", low):
            continue  # build stamp: ephemeral, not a compatibility boundary
        keep.append(t)
    return "; ".join(keep)


def _patch_platform_version_hash() -> None:
    """Make the XLA cache key hash the *stable* platform version.

    Opt-out with TFHE_TPU_RAW_PLATFORM_KEY=1. If the worker's executable
    format does change (the compat/SerializedExecutable tokens), those tokens
    remain in the hash, so stale entries still miss."""
    if os.environ.get("TFHE_TPU_RAW_PLATFORM_KEY", "") not in ("", "0"):
        return
    try:
        from jax._src import cache_key as _ck
    except ImportError:  # pragma: no cover - future jax refactors
        return
    orig_hash_platform = getattr(_ck, "_hash_platform", None)
    hash_string = getattr(_ck, "_hash_string", None)
    if orig_hash_platform is None or hash_string is None:
        return  # future jax renamed the internals: fall back to the raw key
    if getattr(orig_hash_platform, "_tfhe_tpu_stable", False):
        return

    def _hash_platform(hash_obj, backend):
        hash_string(hash_obj, backend.platform)
        hash_string(
            hash_obj, _stable_platform_version(backend.platform_version))

    _hash_platform._tfhe_tpu_stable = True
    _ck._hash_platform = _hash_platform


def enable_compile_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache.

    The blind-rotation graphs take minutes to compile; caching makes repeat
    runs (tests, benchmarks) start instantly."""
    import jax

    _patch_platform_version_hash()

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
