"""Sampler statistics + Blake2XB engine parity.

The statistical half ports the intent of the reference's UnitTestDistrGen.cpp
(src/core/unittest/UnitTestDistrGen.cpp:1-655): mean/stddev/range checks for
the discrete Gaussian, uniform, and ternary generators, for both engines — a
silently mis-scaled sigma would pass every truth-table test while eating the
noise margin, so it is pinned here.

The Blake2XB half checks the u32 stream word-for-word against golden vectors
produced by compiling the reference's own blake2xb-ref.c + blake2engine.h
semantics (seed = 16 LE u32 words as the 64-byte key, message = LE64 refill
counter, 4096-byte buffers).
"""

import numpy as np
import pytest

from tfhe_tpu.utils.blake2 import Blake2XbEngine, blake2xb
from tfhe_tpu.utils.rng import BinFHERng

ENGINES = ["pcg64", "blake2xb"]


# -- Blake2XB byte-stream parity (reference blake2xb-ref.c golden runs) -----

def test_blake2xb_engine_golden():
    """First/last words of the first two 1024-word refills for the seed
    seed[i] = i * 2654435761 mod 2^32, and the small-seed ctor (seed=42)."""
    seed = np.array([i * 2654435761 % 2**32 for i in range(16)], dtype=np.uint32)
    eng = Blake2XbEngine(seed)
    buf0 = eng.next_u32(1024)
    assert buf0[:4].tolist() == [1043991710, 1715037011, 1722934540, 1510961063]
    assert buf0[1022] == 684680603 and buf0[1023] == 1198001485
    buf1 = eng.next_u32(1024)
    assert buf1[:4].tolist() == [1031185188, 1886345314, 1448413330, 89122185]
    assert buf1[1023] == 2224167169
    # small-seed constructor: seed word 0 only (blake2engine.h:69-71)
    assert Blake2XbEngine(42).next_u32(2).tolist() == [2000801785, 2616911176]


def test_blake2xb_cross_refill_reads():
    """Reads that straddle the 1024-word buffer boundary match a fresh
    engine's contiguous stream."""
    a = Blake2XbEngine(9)
    b = Blake2XbEngine(9)
    got = np.concatenate([a.next_u32(1000), a.next_u32(100), a.next_u32(1000)])
    want = b.next_u32(2100)
    assert np.array_equal(got, want)


def test_blake2xb_counter_constructor():
    """Blake2Engine(seed, counter) semantics: starting at counter=1 equals
    skipping the first refill."""
    seed = np.arange(16, dtype=np.uint32)
    a = Blake2XbEngine(seed)
    a.next_u32(1024)
    b = Blake2XbEngine(seed, counter=1)
    assert np.array_equal(a.next_u32(64), b.next_u32(64))


def test_blake2xb_short_output():
    """Non-multiple-of-64 output lengths (partial last block)."""
    out1 = blake2xb(100, b"msg", b"key")
    out2 = blake2xb(100, b"msg", b"key")
    assert out1 == out2 and len(out1) == 100
    assert blake2xb(4096, b"m", b"k")[:64] != blake2xb(96, b"m", b"k")[:64], \
        "xof_length is part of the parameter block, outputs must differ"


# -- distribution statistics (UnitTestDistrGen.cpp analogue) ----------------

@pytest.mark.parametrize("engine", ENGINES)
def test_dgg_statistics(engine):
    rng = BinFHERng(seed=123, engine=engine)
    sigma = 3.19
    n = 200_000
    x = rng.discrete_gaussian_signed(n, sigma)
    # mean: stderr = sigma/sqrt(n); allow 5 sigma
    assert abs(x.mean()) < 5 * sigma / np.sqrt(n)
    # stddev: stderr ~ sigma/sqrt(2n); allow 5 sigma
    assert abs(x.std() - sigma) < 5 * sigma / np.sqrt(2 * n)
    # tails: |x| <= 10*sigma always; >4 sigma rare but present at this n
    assert np.abs(x).max() <= np.ceil(10 * sigma)
    # symmetry: P(x>0) ~ P(x<0)
    pos, neg = (x > 0).sum(), (x < 0).sum()
    assert abs(pos - neg) < 5 * np.sqrt(n)


@pytest.mark.parametrize("engine", ENGINES)
def test_dgg_residue_embedding(engine):
    rng = BinFHERng(seed=5, engine=engine)
    Q = 134215681
    v = rng.discrete_gaussian(10_000, 3.19, Q)
    v = np.asarray(v, dtype=np.uint64)
    centered = np.where(v > Q // 2, v.astype(np.int64) - Q, v.astype(np.int64))
    assert np.abs(centered).max() <= 32
    assert abs(centered.mean()) < 1.0


@pytest.mark.parametrize("engine", ENGINES)
@pytest.mark.parametrize("modulus", [512, 1 << 14, (1 << 35), 134215681,
                                     (1 << 27) - 39])
def test_dug_statistics(engine, modulus):
    rng = BinFHERng(seed=42, engine=engine)
    n = 100_000
    x = np.asarray(rng.discrete_uniform(n, modulus), dtype=np.float64)
    assert x.min() >= 0 and x.max() < modulus
    mean, var = (modulus - 1) / 2, (modulus**2 - 1) / 12
    assert abs(x.mean() - mean) < 5 * np.sqrt(var / n)
    # occupancy of 16 equal buckets: each within 5 sigma of n/16
    counts = np.bincount((x / modulus * 16).astype(np.int64), minlength=16)
    assert np.abs(counts - n / 16).max() < 5 * np.sqrt(n / 16)


@pytest.mark.parametrize("engine", ENGINES)
def test_tug_statistics(engine):
    rng = BinFHERng(seed=77, engine=engine)
    n = 90_000
    x = rng.ternary_uniform_signed(n)
    assert set(np.unique(x)) <= {-1, 0, 1}
    for v in (-1, 0, 1):
        assert abs((x == v).sum() - n / 3) < 5 * np.sqrt(n * 2 / 9)


def test_blake2xb_keygen_end_to_end():
    """Keys generated from the Blake2XB engine drive a full (host-oracle)
    gate bootstrap correctly, and the same seed reproduces the same keys."""
    from tfhe_tpu import BinFHEContext, Gate
    from tfhe_tpu.utils.numtheory import ntt_prime

    outs = []
    for _ in range(2):
        cc = BinFHEContext(seed=3)
        cc.rng = BinFHERng(seed=3, engine="blake2xb")
        Q = ntt_prime(20, 512)
        cc.generate_binfhe_context_custom(n=16, N=256, q=512, Q=Q, std=3.19,
                                          base_ks=32, base_g=1 << 5, base_r=23)
        sk = cc.key_gen()
        cc.bt_key_gen(sk)
        m1 = np.array([0, 1, 0, 1])
        m2 = np.array([0, 0, 1, 1])
        out = cc.eval_bin_gate(Gate.AND, cc.encrypt(sk, m1), cc.encrypt(sk, m2))
        assert np.array_equal(np.asarray(cc.decrypt(sk, out)), m1 & m2)
        outs.append((np.asarray(out.a).copy(), np.asarray(out.b).copy()))
    assert np.array_equal(outs[0][0], outs[1][0])
    assert np.array_equal(outs[0][1], outs[1][1])
