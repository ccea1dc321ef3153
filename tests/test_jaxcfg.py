"""Tests for the JAX configuration helpers (utils/jaxcfg.py)."""

import hashlib

from tfhe_tpu.utils import jaxcfg


RAW = ("PJRT C API\naxon 0.1.0; SerializedExecutable v9; compile-cache v14; "
       "compat c49\nTFRT TPU v5 lite\n"
       "Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709")


def test_stable_platform_version_strips_build_stamp():
    s = jaxcfg._stable_platform_version(RAW)
    assert "Built on" not in s and "cl/" not in s
    # the compatibility-gating tokens survive
    for tok in ("SerializedExecutable v9", "compile-cache v14", "compat c49",
                "TFRT TPU v5 lite"):
        assert tok in s


def test_stable_across_worker_restarts():
    other = RAW.replace("Nov 12 2025 14:16:36 (1762985796) cl/831091709",
                        "Dec 01 2025 09:00:00 (1764601200) cl/999")
    assert (jaxcfg._stable_platform_version(RAW)
            == jaxcfg._stable_platform_version(other))


def test_format_change_still_misses():
    bumped = RAW.replace("SerializedExecutable v9", "SerializedExecutable v10")
    assert (jaxcfg._stable_platform_version(RAW)
            != jaxcfg._stable_platform_version(bumped))


def test_patch_is_idempotent_and_hash_matches():
    from jax._src import cache_key as ck
    saved = ck._hash_platform
    try:
        jaxcfg._patch_platform_version_hash()
        patched = ck._hash_platform
        jaxcfg._patch_platform_version_hash()
        assert ck._hash_platform is patched  # no double wrap

        class FakeBackend:
            platform = "tpu"
            platform_version = RAW

        class FakeBackend2(FakeBackend):
            platform_version = RAW.replace("cl/831091709", "cl/42")

        h1, h2 = hashlib.sha256(), hashlib.sha256()
        ck._hash_platform(h1, FakeBackend())
        ck._hash_platform(h2, FakeBackend2())
        assert h1.digest() == h2.digest()
    finally:
        ck._hash_platform = saved


def test_opt_out_zero_means_disabled(monkeypatch):
    """TFHE_TPU_RAW_PLATFORM_KEY=0 must NOT activate the opt-out."""
    from jax._src import cache_key as ck

    def raw_hash_platform(hash_obj, backend):  # stand-in unpatched function
        ck._hash_string(hash_obj, backend.platform_version)

    # '0' and '' -> patch applies
    for off in ("0", ""):
        monkeypatch.setattr(ck, "_hash_platform", raw_hash_platform)
        monkeypatch.setenv("TFHE_TPU_RAW_PLATFORM_KEY", off)
        jaxcfg._patch_platform_version_hash()
        assert getattr(ck._hash_platform, "_tfhe_tpu_stable", False), off
    # '1' -> opt-out honored, raw function left in place
    monkeypatch.setattr(ck, "_hash_platform", raw_hash_platform)
    monkeypatch.setenv("TFHE_TPU_RAW_PLATFORM_KEY", "1")
    jaxcfg._patch_platform_version_hash()
    assert ck._hash_platform is raw_hash_platform


def test_cl_substring_in_version_tag_survives():
    """Only build-stamp 'cl/<digits>' lines are dropped, not any 'cl/'."""
    raw = "runtime nacl/v2 feature; SerializedExecutable v9"
    s = jaxcfg._stable_platform_version(raw)
    assert "nacl/v2" in s
